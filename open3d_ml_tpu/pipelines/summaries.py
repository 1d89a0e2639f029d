"""3D TensorBoard summaries for point clouds and boxes.

The reference logs 3D data through the Open3D TensorBoard plugin
(`writer.add_3d`, /root/reference/ml3d/torch/pipelines/
semantic_segmentation.py:482-618). That plugin needs the open3d wheel; here
point clouds go through TensorBoard's standard mesh plugin (`add_mesh`
accepts colored vertex sets), which every TensorBoard install renders.
"""

import numpy as np

from ..vis import BoundingBox3D, LabelLUT


def _label_colors(labels, lut):
    colors = np.full((len(labels), 3), 200, np.uint8)
    for val, label in lut.labels.items():
        colors[labels == val] = (np.clip(label.color, 0, 1) *
                                 255).astype(np.uint8)
    return colors


def add_pointcloud_summary(writer, tag, points, labels=None, lut=None,
                           step=0, max_outputs=1, max_pts=20000):
    """Log a (possibly label-colored) point cloud to TensorBoard.

    Args:
        writer: torch SummaryWriter.
        points: [N, 3] or [B, N, 3] numpy array.
        labels: optional matching int labels.
        lut: LabelLUT for label coloring.
    """
    points = np.asarray(points)
    if points.ndim == 2:
        points = points[None]
        if labels is not None:
            labels = np.asarray(labels)[None]
    b = min(points.shape[0], max_outputs)
    for i in range(b):
        pts = points[i]
        if pts.shape[0] > max_pts:
            sel = np.random.default_rng(0).choice(pts.shape[0], max_pts,
                                                  replace=False)
            pts = pts[sel]
            lab = labels[i][sel] if labels is not None else None
        else:
            lab = labels[i] if labels is not None else None
        if lab is not None and lut is not None:
            colors = _label_colors(np.asarray(lab).reshape(-1), lut)
        else:
            colors = np.full((pts.shape[0], 3), 180, np.uint8)
        import torch
        writer.add_mesh(f"{tag}/{i}",
                        vertices=torch.from_numpy(
                            pts[None].astype(np.float32)),
                        colors=torch.from_numpy(colors[None].astype(
                            np.int32)),
                        global_step=step)


def add_boxes_summary(writer, tag, boxes, step=0, lut=None):
    """Log bounding boxes as a line-vertex mesh."""
    if not boxes:
        return
    lines = BoundingBox3D.create_lines(boxes, lut=lut, out_format="dict")
    v = lines["vertex_positions"]
    c = (np.clip(lines["line_colors"], 0, 1) * 255).astype(np.int32)
    import torch
    # vertices only (mesh plugin has no line primitive); boxes render as
    # corner/arrow point constellations
    writer.add_mesh(tag,
                    vertices=torch.from_numpy(v[None].astype(np.float32)),
                    global_step=step)


def record_summary(writer, cfg_summary, split, tag_prefix, data, results,
                   step, label_to_names=None):
    """Pipeline hook matching the reference's summary config semantics
    (record_for / max_outputs / max_pts, config.py summary section)."""
    record_for = (cfg_summary or {}).get("record_for", []) or []
    if split not in record_for:
        return
    max_outputs = (cfg_summary or {}).get("max_outputs", 1) or 1
    max_pts = (cfg_summary or {}).get("max_pts") or 20000
    lut = LabelLUT(label_to_names) if label_to_names else None
    points = data.get("coords", data.get("point"))
    if points is None:
        return
    labels = None
    if results is not None:
        labels = np.argmax(np.asarray(results), axis=-1)
    add_pointcloud_summary(writer, f"{tag_prefix}/{split}",
                           np.asarray(points), labels, lut, step=step,
                           max_outputs=max_outputs, max_pts=max_pts)
