"""Box/geometry operations (host-side numpy).

Rebuild of /root/reference/ml3d/datasets/utils/operations.py:10-524 with the
external `open3d.ml.contrib.iou_bev_cpu` replaced by the local rotated-IoU op
(ops.iou). Covers rotations, frustum extraction, corner conversions,
points-in-rotated-box tests, gt-database sampling and collision tests.
"""

import copy
import math

import numpy as np

from ...ops.iou import iou_bev


def create_3D_rotations(axis, angle):
    """Rotation matrices [N,3,3] from unit axes [N,3] and angles [N]
    (Rodrigues / quaternion form)."""
    axis = np.asarray(axis, np.float64).reshape(-1, 3)
    angle = np.asarray(angle, np.float64).reshape(-1)
    c = np.cos(angle)
    s = np.sin(angle)
    t = 1.0 - c
    x, y, z = axis[:, 0], axis[:, 1], axis[:, 2]
    R = np.stack([
        c + t * x * x, t * x * y - s * z, t * x * z + s * y,
        t * x * y + s * z, c + t * y * y, t * y * z - s * x,
        t * x * z - s * y, t * y * z + s * x, c + t * z * z
    ], axis=1)
    return R.reshape(-1, 3, 3).astype(np.float32)


def projection_matrix_to_CRT_kitti(proj):
    """Split a KITTI projection P = C @ [R|T] via QR (C upper triangular)."""
    CR = proj[0:3, 0:3]
    CT = proj[0:3, 3]
    RinvCinv = np.linalg.inv(CR)
    Rinv, Cinv = np.linalg.qr(RinvCinv)
    C = np.linalg.inv(Cinv)
    R = np.linalg.inv(Rinv)
    T = Cinv @ CT
    return C, R, T


def get_frustum(bbox_image, C, near_clip=0.001, far_clip=100):
    """Frustum corners [8,3] in camera coords for an image-space bbox."""
    fku = C[0, 0]
    fkv = -C[1, 1]
    u0v0 = C[0:2, 2]
    z_points = np.array([near_clip] * 4 + [far_clip] * 4,
                        dtype=C.dtype)[:, np.newaxis]
    b = bbox_image
    box_corners = np.array(
        [[b[0], b[1]], [b[0], b[3]], [b[2], b[3]], [b[2], b[1]]],
        dtype=C.dtype)
    near_corners = (box_corners - u0v0) / np.array(
        [fku / near_clip, -fkv / near_clip], dtype=C.dtype)
    far_corners = (box_corners - u0v0) / np.array(
        [fku / far_clip, -fkv / far_clip], dtype=C.dtype)
    ret_xy = np.concatenate([near_corners, far_corners], axis=0)
    return np.concatenate([ret_xy, z_points], axis=1)


def camera_to_lidar(points, world_cam):
    """Camera -> lidar coords (row-vector [N,4] @ inv(world_cam))."""
    shape = list(points.shape[0:-1])
    if points.shape[-1] == 3:
        points = np.concatenate([points, np.ones(shape + [1])], axis=-1)
    lidar_points = points @ np.linalg.inv(world_cam)
    return lidar_points[..., :3]


def corners_nd(dims, origin=0.5):
    """Relative box corners [N, 2^ndim, ndim] for per-dim lengths [N,ndim].

    2D corner order is clockwise from the minimum point; 3D follows the
    standard KITTI corner layout.
    """
    dims = np.asarray(dims)
    ndim = int(dims.shape[1])
    corners_norm = np.stack(
        np.unravel_index(np.arange(2**ndim), [2] * ndim),
        axis=1).astype(dims.dtype)
    if ndim == 2:
        corners_norm = corners_norm[[0, 1, 3, 2]]
    elif ndim == 3:
        corners_norm = corners_norm[[0, 1, 3, 2, 4, 5, 7, 6]]
    corners_norm = corners_norm - np.array(origin, dtype=dims.dtype)
    return dims.reshape(-1, 1, ndim) * corners_norm.reshape(1, 2**ndim, ndim)


def rotation_3d_in_axis(points, angles, axis=2):
    """Rotate point sets [N,P,3] by per-set angles [N] about one axis."""
    rot_sin = np.sin(angles)
    rot_cos = np.cos(angles)
    ones = np.ones_like(rot_cos)
    zeros = np.zeros_like(rot_cos)
    if axis == 1:
        rot_mat_T = np.stack([[rot_cos, zeros, -rot_sin],
                              [zeros, ones, zeros],
                              [rot_sin, zeros, rot_cos]])
    elif axis in (2, -1):
        rot_mat_T = np.stack([[rot_cos, -rot_sin, zeros],
                              [rot_sin, rot_cos, zeros],
                              [zeros, zeros, ones]])
    elif axis == 0:
        rot_mat_T = np.stack([[zeros, rot_cos, -rot_sin],
                              [zeros, rot_sin, rot_cos],
                              [ones, zeros, zeros]])
    else:
        raise ValueError("axis should be in range")
    return np.einsum("aij,jka->aik", points, rot_mat_T)


def rotation_2d(points, angles):
    """Rotate 2D point sets [N,P,2] clockwise for positive angles."""
    rot_sin = np.sin(angles)
    rot_cos = np.cos(angles)
    rot_mat_T = np.stack([[rot_cos, -rot_sin], [rot_sin, rot_cos]])
    return np.einsum("aij,jka->aik", points, rot_mat_T)


def center_to_corner_box3d(centers, dims, angles=None,
                           origin=(0.5, 1.0, 0.5)):
    """KITTI (center, dims, ry) -> corners [N,8,3]. origin (0.5,1.0,0.5) for
    camera frame, (0.5,0.5,0) for lidar frame."""
    corners = corners_nd(dims, origin=origin)
    if angles is not None:
        corners = rotation_3d_in_axis(corners, angles)
    return corners + np.reshape(centers, (-1, 1, 3))


def center_to_corner_box2d(boxes, origin=0.5):
    """BEV corners [N,4,2] for a list of BEVBox3D objects."""
    if len(boxes) == 0:
        return np.zeros((0, 4, 2))
    flat = np.array([box.to_xyzwhlr() for box in boxes])
    corners = corners_nd(flat[:, 3:5], origin=origin)
    corners = rotation_2d(corners, flat[:, 6])
    return corners + flat[:, 0:2].reshape(-1, 1, 2)


def corner_to_surfaces_3d(corners):
    """[N,8,3] corners -> [N,6,4,3] surfaces with inward normals."""
    surfaces = np.array([
        [corners[:, 0], corners[:, 1], corners[:, 2], corners[:, 3]],
        [corners[:, 7], corners[:, 6], corners[:, 5], corners[:, 4]],
        [corners[:, 0], corners[:, 3], corners[:, 7], corners[:, 4]],
        [corners[:, 1], corners[:, 5], corners[:, 6], corners[:, 2]],
        [corners[:, 0], corners[:, 4], corners[:, 5], corners[:, 1]],
        [corners[:, 3], corners[:, 2], corners[:, 6], corners[:, 7]],
    ]).transpose([2, 0, 1, 3])
    return surfaces


def surface_equ_3d(polygon_surfaces):
    """Plane equations (normal, -d) for polygon surfaces
    [P, S, >=3, 3] with inward normals."""
    surface_vec = polygon_surfaces[:, :, :2, :] - \
        polygon_surfaces[:, :, 1:3, :]
    normal_vec = np.cross(surface_vec[:, :, 0, :], surface_vec[:, :, 1, :])
    d = np.einsum("aij, aij->ai", normal_vec, polygon_surfaces[:, :, 0, :])
    return normal_vec, -d


def points_in_convex_polygon_3d(points, polygon_surfaces, num_surfaces=None):
    """Membership matrix [num_points, num_polygons] for convex polyhedra."""
    max_num_surfaces = polygon_surfaces.shape[1]
    num_polygons = polygon_surfaces.shape[0]
    if num_surfaces is None:
        num_surfaces = np.full((num_polygons,), 9999999, dtype=np.int64)
    normal_vec, d = surface_equ_3d(polygon_surfaces[:, :, :3, :])
    num_points = points.shape[0]
    pts = points.reshape(num_points, 1, 1, 3)
    nv = normal_vec.reshape(1, num_polygons, max_num_surfaces, 3)
    sign = np.sum(pts * nv, axis=-1) + d
    out_range = np.arange(max_num_surfaces) >= \
        num_surfaces.reshape(num_polygons, 1)
    out_range = out_range.reshape(1, num_polygons, max_num_surfaces)
    return np.all((sign < 0) | out_range, axis=-1)


def points_in_box(points, rbbox, origin=(0.5, 0.5, 0), camera_frame=False,
                  cam_world=None):
    """Membership matrix [N, M] of points in rotated 3D boxes [M,7]."""
    if len(rbbox) == 0:
        return np.zeros((0, 7))
    if camera_frame:
        assert cam_world is not None, \
            "Provide cam_to_world matrix for camera-frame boxes."
        points = np.hstack(
            (points, np.ones((points.shape[0], 1), dtype=np.float32)))
        points = np.matmul(points, cam_world)[..., :3]
    rbbox = np.array(rbbox)
    corners = center_to_corner_box3d(rbbox[:, :3], rbbox[:, 3:6],
                                     rbbox[:, 6], origin=origin)
    surfaces = corner_to_surfaces_3d(corners)
    return points_in_convex_polygon_3d(points[:, :3], surfaces)


def filter_by_min_points(bboxes, min_points_dict):
    """Keep gt boxes with at least min_points_dict[class] inside points."""
    filtered = []
    for box in bboxes:
        if box.label_class in min_points_dict:
            if box.points_inside_box.shape[0] > \
                    min_points_dict[box.label_class]:
                filtered.append(box)
        else:
            filtered.append(box)
    return filtered


def random_sample(files, num, rng=None):
    if len(files) <= num:
        return list(files)
    rng = rng or np.random.default_rng()
    idx = rng.choice(len(files), num, replace=False)
    return [files[i] for i in idx]


def corner_to_standup_nd(boxes_corner):
    """[N, 2^dim, dim] corners -> [N, 2*dim] axis-aligned (min..max) boxes."""
    mins = boxes_corner.min(axis=1)
    maxs = boxes_corner.max(axis=1)
    return np.concatenate([mins, maxs], axis=1)


# reference-API alias (it was numba-jit'ed there, hence the name)
corner_to_standup_nd_jit = corner_to_standup_nd


def box_collision_test(boxes, qboxes):
    """Boolean BEV-overlap matrix between two lists of BEVBox3D."""
    b = np.array([box.to_xyzwhlr() for box in boxes], dtype=np.float32)
    q = np.array([box.to_xyzwhlr() for box in qboxes], dtype=np.float32)
    b = b[:, [0, 1, 3, 4, 6]]
    q = q[:, [0, 1, 3, 4, 6]]
    coll = iou_bev(b, q)
    return coll > 1e-8


def sample_class(class_name, num, gt_boxes, db_boxes, rng=None):
    """Pick up to ``num`` database boxes of one class that do not collide
    with existing boxes (reference operations.py:437-465)."""
    if num == 0:
        return []
    sampled = random_sample(db_boxes, num, rng=rng)
    sampled = copy.deepcopy(sampled)

    num_gt = len(gt_boxes)
    num_sampled = len(sampled)
    boxes = list(gt_boxes) + sampled
    coll_mat = box_collision_test(boxes, boxes)
    diag = np.arange(len(boxes))
    coll_mat[diag, diag] = False

    valid = []
    for i in range(num_gt, num_gt + num_sampled):
        if coll_mat[i].any():
            coll_mat[i] = False
            coll_mat[:, i] = False
        else:
            valid.append(sampled[i - num_gt])
    return valid


def remove_points_in_boxes(points, boxes):
    """Drop points inside any of the given BEVBox3D boxes."""
    flat_boxes = [box.to_xyzwhlr() for box in boxes]
    masks = points_in_box(points, flat_boxes)
    return points[np.logical_not(masks.any(-1))]


def get_min_bbox(points):
    """Minimum (PCA-aligned) BEV 3D bounding box (x,y,z,w,h,l,yaw)."""
    points = points.copy()
    h_min = np.min(points[:, 2])
    h_max = np.max(points[:, 2])
    points = points[:, :2]

    cov_points = np.cov(points, rowvar=False, bias=True)
    val, vect = np.linalg.eig(cov_points)
    tvect = np.transpose(vect)
    points_rot = np.dot(points, np.linalg.inv(tvect))
    min_a = np.min(points_rot, axis=0)
    max_a = np.max(points_rot, axis=0)
    diff = max_a - min_a
    center = np.dot(min_a + diff * 0.5, tvect)
    yaw = math.atan(tvect[0, 1] / tvect[0, 0])
    return [center[0], center[1], (h_min + h_max) * 0.5, diff[0],
            h_max - h_min, diff[1], yaw]


def in_range_bev(box_range, box_xyzwhlr):
    """BEV-center-in-range test for one xyzwhlr box."""
    return ((box_xyzwhlr[0] > box_range[0]) &
            (box_xyzwhlr[1] > box_range[1]) &
            (box_xyzwhlr[0] < box_range[2]) &
            (box_xyzwhlr[1] < box_range[3]))
