"""Map-level chunk merging, GT merging, and semantic filtering.

Behavioral ports of reference point_cloud_utils.py:253-491, including its
exact association quirks (the scalar-unique "union" in the bbox IoU, the
first-come/best-iou pair resolution), since the published AP numbers flow
through them.
"""

from __future__ import annotations

import numpy as np

from autoinst_tpu.utils.pointcloud import PointCloud


def divide_indices_into_chunks(max_index: int, chunk_size: int = 1000):
    """(reference point_cloud_utils.py:177-182)"""
    return [(s, min(s + chunk_size, max_index))
            for s in range(0, max_index, chunk_size)]


def merge_unite_gt(chunks: list[PointCloud]) -> PointCloud:
    """Concatenate GT chunks + dedupe (reference point_cloud_utils.py:320-329)."""
    merge = PointCloud()
    for c in chunks:
        merge = merge + c
    return merge.remove_duplicated_points()


def _instances_by_color(points: np.ndarray, colors: np.ndarray):
    """unique color row -> {points, inds}, skipping black (streets)."""
    uniq = np.unique(colors, axis=0)
    out = {}
    for i in range(uniq.shape[0]):
        if np.all(uniq[i] == 0.0):
            continue
        inds = np.where(np.all(colors == uniq[i], axis=1))[0]
        out[i] = {"points": points[inds], "inds": inds}
    return uniq, out


def merge_chunks_unite_instances(chunks: list[PointCloud]) -> PointCloud:
    """Sequential instance-association merge
    (reference merge_chunks_unite_instances2, point_cloud_utils.py:387-491).

    For each new chunk: crop the running map to a 40m box around the chunk
    center, associate instances by bbox-overlap IoU (intersection = points of
    the new instance inside the old instance's AABB; "union" = count of
    unique scalar values of the concatenated coordinates -- reference quirk,
    :457), resolve pairs first-come with best-iou override, recolor matched
    new instances to the old color, then append + dedupe."""
    merge = PointCloud()
    merge = merge + chunks[0]

    for new_chunk in chunks[1:]:
        center = new_chunk.points.mean(axis=0)
        half = 40 / 2.0
        crop_ids = merge.crop_aabb(center - half, center + half)
        extracted = merge.select_by_index(crop_ids)

        colors_2 = np.asarray(new_chunk.colors).copy()
        uniq1, inst1 = _instances_by_color(extracted.points, extracted.colors)
        uniq2, inst2 = _instances_by_color(new_chunk.points, colors_2)

        id_pairs_iou = []
        for id_1, e1 in inst1.items():
            p1 = e1["points"]
            mn, mx = p1.min(axis=0), p1.max(axis=0)
            association = []
            for id_2, e2 in inst2.items():
                p2 = e2["points"]
                inter = np.where(np.all(p2 >= mn, axis=1)
                                 & np.all(p2 <= mx, axis=1))[0].shape[0]
                if inter > 0:
                    union = len(np.unique(np.concatenate((p1, p2))))
                    iou = float(inter) / float(union)
                    if iou > 0.01:
                        association.append((id_2, iou))
            for id_2, iou in association:
                id_pairs_iou.append((id_1, (id_2, iou)))

        ids1, ids2, ious = [], [], []
        for id1, (id2, iou) in id_pairs_iou:
            if id2 not in ids2:
                ids1.append(id1)
                ids2.append(id2)
                ious.append(iou)
            else:
                i = ids2.index(id2)
                if iou > ious[i]:
                    ious[i] = iou
                    ids1[i] = id1

        for id1, id2 in zip(ids1, ids2):
            colors_2[inst2[id2]["inds"]] = uniq1[id1]

        recolored = PointCloud(new_chunk.points, colors_2)
        merge = merge + recolored
        merge.remove_duplicated_points()
    return merge


# reference alias (point_cloud_utils.py:387)
merge_chunks_unite_instances2 = merge_chunks_unite_instances


def remove_semantics(labels: np.ndarray, preds: np.ndarray,
                     threshold: float = 0.8) -> np.ndarray:
    """Zero predicted instances whose overlap with the GT-unlabeled region
    exceeds `threshold` (reference point_cloud_utils.py:253-287). Vectorized
    over a contingency count instead of the reference's thread pool."""
    out = preds.copy()
    unlabeled = labels == 0
    ids, counts = np.unique(preds, return_counts=True)
    inter = {i: 0 for i in ids}
    uid, ucnt = np.unique(preds[unlabeled], return_counts=True)
    for i, c in zip(uid, ucnt):
        inter[i] = c
    for i, c in zip(ids, counts):
        if inter[i] > threshold * c:
            out[preds == i] = 0
    return out


def get_corrected_ground(chunk_downsample_dict, sequence,
                         mean_height: float = 0.6):
    """(reference point_cloud_utils.py:331-342)"""
    from autoinst_tpu.pipeline.chunking import statistical_inlier_indices
    ground = chunk_downsample_dict["pcd_ground_chunks"][sequence]
    inliers = statistical_inlier_indices(ground.points)
    ground_in = ground.select_by_index(inliers)
    mh = np.mean(ground_in.points[:, 2]) if len(ground_in) else 0.0
    in_ground = np.where(ground_in.points[:, 2] < (mh + mean_height))[0]
    pcd_chunk_ground = ground_in.select_by_index(in_ground)
    pcd_chunk_ground.paint_uniform_color([0, 0, 0])
    input_pcd = chunk_downsample_dict["pcd_nonground_chunks"][sequence] \
        + pcd_chunk_ground
    inst_ground = chunk_downsample_dict["kitti_labels"]["ground"]["instance"][
        sequence][inliers][in_ground]
    return input_pcd, inst_ground
