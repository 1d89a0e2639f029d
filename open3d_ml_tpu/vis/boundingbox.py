"""Oriented 3D bounding box for visualization + detection data interchange.

Rebuild of /root/reference/ml3d/vis/boundingbox.py:6-240 without the open3d
GUI dependency: `create_lines(..., out_format="dict")` produces the same
numpy lineset dict the reference's TensorBoard plugin consumes; when open3d
is importable, "lineset" output is also supported.
"""

import numpy as np


class BoundingBox3D:
    """Axially-oriented bounding box defined by center + orthonormal
    front/up/left axes + size (width, height, depth edge-to-edge)."""

    next_id = 1

    def __init__(self, center, front, up, left, size, label_class,
                 confidence, meta=None, show_class=False,
                 show_confidence=False, show_meta=None, identifier=None,
                 arrow_length=1.0):
        assert len(center) == 3 and len(front) == 3
        assert len(up) == 3 and len(left) == 3 and len(size) == 3

        self.center = np.array(center, dtype="float32")
        self.front = np.array(front, dtype="float32")
        self.up = np.array(up, dtype="float32")
        self.left = np.array(left, dtype="float32")
        self.size = size
        self.label_class = label_class
        self.confidence = confidence
        self.meta = meta
        self.show_class = show_class
        self.show_confidence = show_confidence
        self.show_meta = show_meta
        if identifier is not None:
            self.identifier = identifier
        else:
            self.identifier = "box:" + str(BoundingBox3D.next_id)
            BoundingBox3D.next_id += 1
        self.arrow_length = arrow_length

    def __repr__(self):
        s = f"{self.identifier} (class={self.label_class}, " \
            f"conf={self.confidence}"
        if self.meta is not None:
            s += f", meta={self.meta}"
        return s + ")"

    def corners(self):
        """The 8 box corners [8,3] (no arrow vertices)."""
        x = 0.5 * self.size[0] * self.left
        y = 0.5 * self.size[1] * self.up
        z = 0.5 * self.size[2] * self.front
        c = self.center
        return np.stack([
            c - x - y - z, c - x - y + z, c - x + y + z, c - x + y - z,
            c + x - y - z, c + x - y + z, c + x + y + z, c + x + y - z
        ])

    @staticmethod
    def create_lines(boxes, lut=None, out_format="dict"):
        """Build a lineset (14 verts / 17 lines per box incl. front arrow).

        Returns a dict of numpy arrays {"vertex_positions", "line_indices",
        "line_colors", "bbox_labels", "bbox_confidences"} — the same contract
        as the reference (boundingbox.py:87-184) — or an open3d LineSet when
        out_format == "lineset" and open3d is available.
        """
        if out_format not in ("lineset", "dict"):
            raise ValueError("output_format must be 'lineset' or 'dict'")

        nverts = 14
        nlines = 17
        points = np.zeros((nverts * len(boxes), 3), dtype="float32")
        indices = np.zeros((nlines * len(boxes), 2), dtype="int32")
        colors = np.zeros((nlines * len(boxes), 3), dtype="float32")

        for i, box in enumerate(boxes):
            pidx = nverts * i
            x = 0.5 * box.size[0] * box.left
            y = 0.5 * box.size[1] * box.up
            z = 0.5 * box.size[2] * box.front
            arrow_tip = box.center + z + box.arrow_length * box.front
            arrow_mid = box.center + z + 0.6 * box.arrow_length * box.front
            head_length = 0.3 * box.arrow_length
            # It seems to be substantially faster to assign directly for the
            # points, as opposed to points[pidx:pidx+nverts] = np.stack((...))
            points[pidx] = box.center + x + y + z
            points[pidx + 1] = box.center - x + y + z
            points[pidx + 2] = box.center - x + y - z
            points[pidx + 3] = box.center + x + y - z
            points[pidx + 4] = box.center + x - y + z
            points[pidx + 5] = box.center - x - y + z
            points[pidx + 6] = box.center - x - y - z
            points[pidx + 7] = box.center + x - y - z
            points[pidx + 8] = box.center + z
            points[pidx + 9] = arrow_tip
            points[pidx + 10] = arrow_mid + head_length * box.up
            points[pidx + 11] = arrow_mid - head_length * box.up
            points[pidx + 12] = arrow_mid + head_length * box.left
            points[pidx + 13] = arrow_mid - head_length * box.left

        for i, box in enumerate(boxes):
            pidx = nverts * i
            i0 = nlines * i
            indices[i0:i0 + nlines] = np.array(
                [(pidx, pidx + 1), (pidx + 1, pidx + 2), (pidx + 2, pidx + 3),
                 (pidx + 3, pidx), (pidx + 4, pidx + 5), (pidx + 5, pidx + 6),
                 (pidx + 6, pidx + 7), (pidx + 7, pidx + 4), (pidx, pidx + 4),
                 (pidx + 1, pidx + 5), (pidx + 2, pidx + 6),
                 (pidx + 3, pidx + 7), (pidx + 8, pidx + 9),
                 (pidx + 9, pidx + 10), (pidx + 9, pidx + 11),
                 (pidx + 9, pidx + 12), (pidx + 9, pidx + 13)],
                dtype="int32")

            if lut is not None and box.label_class in lut.labels:
                label = lut.labels[box.label_class]
                c = (label.color[0], label.color[1], label.color[2])
            else:
                if box.confidence == -1.0:
                    c = (0.0, 1.0, 0.0)  # ground truth: green
                elif box.confidence >= 0 and box.confidence <= 1.0:
                    c = (1.0, 0.0, 0.0)  # prediction: red
                else:
                    c = (0.5, 0.5, 0.5)
            colors[i0:i0 + nlines] = c

        if out_format == "dict":
            return {
                "vertex_positions": points,
                "line_indices": indices,
                "line_colors": colors,
                "bbox_labels": tuple(b.label_class for b in boxes),
                "bbox_confidences": tuple(b.confidence for b in boxes),
            }
        import open3d as o3d
        lines = o3d.geometry.LineSet()
        lines.points = o3d.utility.Vector3dVector(points.astype(np.float64))
        lines.lines = o3d.utility.Vector2iVector(indices)
        lines.colors = o3d.utility.Vector3dVector(colors.astype(np.float64))
        return lines

    @staticmethod
    def project_to_img(boxes, img, lidar2img_rt=np.ones(4), lut=None):
        """Draw box outlines into an RGB image array (in place)."""
        lines = BoundingBox3D.create_lines(boxes, lut, out_format="dict")
        points = lines["vertex_positions"]
        indices = lines["line_indices"]
        colors = lines["line_colors"]

        pts_4d = np.concatenate(
            [points.reshape(-1, 3),
             np.ones((len(boxes) * 14, 1))], axis=-1)
        pts_2d = pts_4d @ lidar2img_rt.T

        pts_2d[:, 2] = np.clip(pts_2d[:, 2], a_min=1e-5, a_max=1e5)
        pts_2d[:, 0] /= pts_2d[:, 2]
        pts_2d[:, 1] /= pts_2d[:, 2]
        imgfov_pts_2d = pts_2d[..., :2].reshape(len(boxes), 14, 2)
        indices_2d = indices[..., :2].reshape(len(boxes), 17, 2)
        colors_2d = colors[..., :3].reshape(len(boxes), 17, 3)
        return BoundingBox3D.plot_rect3d_on_img(
            img, len(boxes), imgfov_pts_2d, indices_2d, colors_2d,
            thickness=3)

    @staticmethod
    def plot_rect3d_on_img(img, num_rects, rect_corners, line_indices,
                           color=None, thickness=1):
        """Rasterize projected box edges onto the image via PIL."""
        from PIL import Image, ImageDraw
        img_pil = Image.fromarray(img)
        draw = ImageDraw.Draw(img_pil)
        if color is None:
            color = np.full((num_rects, 17, 3), (0, 255, 0))
        for i in range(num_rects):
            corners = rect_corners[i].astype(np.int32)
            interesting_corners_scale = 3.0
            if min(corners[:, 0]) < -interesting_corners_scale * img.shape[1] \
               or max(corners[:, 0]) > \
               interesting_corners_scale * img.shape[1] or \
               min(corners[:, 1]) < -interesting_corners_scale * img.shape[0] \
               or max(corners[:, 1]) > \
               interesting_corners_scale * img.shape[0]:
                continue
            for j, (start, end) in enumerate(line_indices[i]):
                c = tuple((color[i][j] * 255).astype(np.uint8).tolist())
                pt1 = (corners[start % 14][0], corners[start % 14][1])
                pt2 = (corners[end % 14][0], corners[end % 14][1])
                draw.line([pt1, pt2], fill=c, width=thickness)
        return np.array(img_pil)
