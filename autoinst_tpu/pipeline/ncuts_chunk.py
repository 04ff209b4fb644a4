"""Per-chunk NCuts segmentation: fused affinity -> batched spectral cuts ->
label reprojection (reference: pipeline/ncuts/ncuts_utils.py:28-204).

TPU mapping: the chunk's padded point set goes to the device once; the fused
Pallas kernel emits the N^2 affinity directly in HBM; the recursive cut runs
as the bucketed worklist solver; only the final label vector returns to host.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from autoinst_tpu.ncuts.solver import recursive_ncut
from autoinst_tpu.ops.affinity import affinity_pallas, affinity_xla
from autoinst_tpu.ops.neighbors import nn1_bruteforce
from autoinst_tpu.pipeline.chunking import (get_indices_feature_reprojection,
                                            statistical_inlier_indices,
                                            tarl_features_per_patch)
from autoinst_tpu.utils.colors import generate_random_colors
from autoinst_tpu.utils.transfer import put_features
from autoinst_tpu.utils.pointcloud import PointCloud


def _pad_multiple(arr: np.ndarray, tile: int):
    n = len(arr)
    m = max(((n + tile - 1) // tile) * tile, tile)
    out = np.zeros((m,) + arr.shape[1:], np.float32)
    out[:n] = arr
    valid = np.zeros(m, bool)
    valid[:n] = True
    return out, valid


def _use_pallas(flag: bool | None) -> bool:
    if flag is not None:
        return flag
    return jax.default_backend() == "tpu"


def chunk_affinity(points_major: np.ndarray, cfg, tarl_features=None
                   ) -> tuple[jax.Array, int]:
    """Build the padded affinity matrix for one chunk on device."""
    weights = cfg.config
    padded, valid = _pad_multiple(points_major, cfg.affinity_tile)
    n = len(points_major)
    tarl = None
    if tarl_features is not None:
        tarl = np.zeros((len(padded), tarl_features.shape[1]), np.float32)
        tarl[:n] = tarl_features
        # bf16 wire format on TPU (utils/transfer.py): feature uploads
        # dominate tunnel time; device-side math stays f32
        tarl = put_features(tarl)
    if _use_pallas(cfg.use_pallas) and not weights.get("gamma") \
            and not weights.get("beta"):
        A = affinity_pallas(jnp.asarray(padded), jnp.asarray(valid),
                            tarl=tarl, alpha=weights["alpha"],
                            theta=weights["theta"],
                            proximity=cfg.proximity_threshold,
                            tile=cfg.affinity_tile)
    else:
        A = affinity_xla(jnp.asarray(padded), jnp.asarray(valid), tarl=tarl,
                         alpha=weights["alpha"], theta=weights["theta"],
                         proximity=cfg.proximity_threshold)
    return A, n


def kdtree_1nn_reprojection(features_to: np.ndarray, pcd_to: PointCloud,
                            features_from: np.ndarray, pcd_from: PointCloud,
                            max_radius: float | None = None,
                            no_feature_label=(1, 0, 0)) -> np.ndarray:
    """1-NN feature transfer (reference point_cloud_utils.py:144-174), as one
    device query instead of a per-point KD-tree loop."""
    if len(pcd_from) == 0:
        return features_to
    idx, d2 = nn1_bruteforce(jnp.asarray(pcd_to.points, jnp.float32),
                             jnp.asarray(pcd_from.points, jnp.float32))
    idx = np.asarray(idx)
    out = features_from[idx]
    if max_radius is not None:
        far = np.sqrt(np.asarray(d2)) > max_radius
        out[far] = np.asarray(no_feature_label, out.dtype)
    features_to[:] = out
    return features_to


def ncuts_chunk(dataset, chunk_downsample_dict, pcd_nonground_minor,
                T_pcd, sampled_indices_global, cfg, sequence=None,
                patchwise_indices=None):
    """Segment one chunk; returns (merged_chunk, pcd_chunk, cut_ground,
    inst_ground, seg_ground) like reference ncuts_utils.py:28-204."""
    weights = cfg.config
    first_id = patchwise_indices[sequence][0]
    center_id = chunk_downsample_dict["center_ids"][sequence]
    center_position = chunk_downsample_dict["center_positions"][sequence]

    pcd_chunk = chunk_downsample_dict["pcd_nonground_chunks"][sequence]
    pcd_ground_chunk = chunk_downsample_dict["pcd_ground_chunks"][sequence]
    chunk_major = chunk_downsample_dict[
        "pcd_nonground_chunks_major_downsampling"][sequence]
    points_major = np.asarray(chunk_major.points, np.float32)
    num_points_major = len(points_major)

    tarl_features = None
    if weights["theta"]:
        tarl_indices_global, _ = get_indices_feature_reprojection(
            sampled_indices_global, center_id,
            adjacent_frames=cfg.adjacent_frames_tarl)
        tarl_features = tarl_features_per_patch(
            dataset, chunk_major, T_pcd, center_position,
            tarl_indices_global, cfg.chunk_size,
            search_radius=cfg.major_voxel_size / 2.0, norm=cfg.tarl_norm)

    backend = getattr(cfg, "ncut_backend", "auto")
    if backend == "reference":
        # parity twin: the upstream scipy/ARPACK chain end-to-end on the
        # same inputs (reference_twin.py); spatial/TARL configs only
        if weights.get("gamma") or weights.get("beta"):
            raise NotImplementedError(
                "reference twin covers the spatial/TARL configs")
        from autoinst_tpu.ncuts.reference_twin import reference_chunk_labels
        labels = reference_chunk_labels(
            points_major, tarl_features, weights["alpha"], weights["theta"],
            cfg.proximity_threshold, weights["T"], cfg.split_lim)
    elif weights.get("gamma") or weights.get("beta"):
        from autoinst_tpu.ops.affinity import sam_label_distance
        from autoinst_tpu.pipeline.image_features import \
            image_affinity_terms
        cam_indices_global, _ = get_indices_feature_reprojection(
            sampled_indices_global, first_id,
            adjacent_frames=cfg.adjacent_frames_cam)
        dino_terms, sam_ids = image_affinity_terms(
            dataset, pcd_nonground_minor,
            chunk_downsample_dict["indices"][sequence], chunk_major, T_pcd,
            cam_indices_global, cfg,
            sam=bool(weights.get("beta")), dino=bool(weights.get("gamma")))
        padded, valid = _pad_multiple(points_major, cfg.affinity_tile)
        n_pad = len(padded)
        tarl_pad = None
        if tarl_features is not None:
            tarl_pad = np.zeros((n_pad, 96), np.float32)
            tarl_pad[:num_points_major] = tarl_features
            tarl_pad = jnp.asarray(tarl_pad)
        sam_terms = []
        if sam_ids:
            # spatial proximity mask over padded points for the vote term
            d = np.linalg.norm(padded[:, None, :] - padded[None, :, :],
                               axis=-1)
            prox = ((d <= cfg.proximity_threshold)
                    & valid[:, None] & valid[None, :]).astype(np.float32)
            for ids in sam_ids:
                ids_pad = -np.ones((n_pad, ids.shape[1]), np.int32)
                ids_pad[:num_points_major] = ids
                k = int(max(ids.max(), 0)) + 2
                sam_terms.append(sam_label_distance(
                    jnp.asarray(ids_pad), jnp.asarray(prox), k))
        dino_pads = [jnp.asarray(_pad_multiple(f, cfg.affinity_tile)[0])
                     for f in dino_terms]
        if _use_pallas(cfg.use_pallas):
            # fused kernel with the DINO planes + pre-summed SAM vote
            # distance as extra inputs (SURVEY north star; VERDICT r3 #7)
            sam_sum = None
            if sam_terms:
                sam_sum = sam_terms[0]
                for s in sam_terms[1:]:
                    sam_sum = sam_sum + s
            A = affinity_pallas(
                jnp.asarray(padded), jnp.asarray(valid), tarl=tarl_pad,
                dino_terms=tuple(dino_pads), sam_dist=sam_sum,
                alpha=weights["alpha"], theta=weights["theta"],
                gamma=weights.get("gamma", 0.0),
                beta=weights.get("beta", 0.0),
                proximity=cfg.proximity_threshold, tile=cfg.affinity_tile)
        else:
            A = affinity_xla(
                jnp.asarray(padded), jnp.asarray(valid), tarl=tarl_pad,
                dino_terms=dino_pads,
                sam_terms=sam_terms,
                alpha=weights["alpha"], theta=weights["theta"],
                gamma=weights.get("gamma", 0.0),
                beta=weights.get("beta", 0.0),
                proximity=cfg.proximity_threshold)
    else:
        A, _ = chunk_affinity(points_major, cfg, tarl_features)

    if backend == "reference":
        pass  # labels already computed by the twin above
    elif backend == "device" or (backend == "auto"
                                 and jax.default_backend() == "tpu"):
        from autoinst_tpu.ncuts.device_solver import recursive_ncut_device
        labels = recursive_ncut_device(A[None], [num_points_major],
                                       T=weights["T"],
                                       split_lim=cfg.split_lim)[0]
    else:
        labels = recursive_ncut(A, num_points_major, T=weights["T"],
                                split_lim=cfg.split_lim,
                                method=cfg.ncut_method)

    random_colors = generate_random_colors(600)
    pcd_color = np.zeros((num_points_major, 3))
    for i in np.unique(labels):
        # modulo guard: the reference indexes its 600-color palette directly
        # (ncuts_utils.py:177-183) and would crash past 600 clusters
        pcd_color[labels == i] = np.array(
            random_colors[int(i) % len(random_colors)]) / 255.0

    pcd_chunk.paint_uniform_color([0, 0, 0])
    colors = kdtree_1nn_reprojection(np.asarray(pcd_chunk.colors), pcd_chunk,
                                     pcd_color, chunk_major)
    pcd_chunk.colors = colors

    # ground: statistical inliers, cut at mean height + cfg.mean_height
    inliers = statistical_inlier_indices(pcd_ground_chunk.points)
    ground_inliers = pcd_ground_chunk.select_by_index(inliers)
    mean_height = np.mean(ground_inliers.points[:, 2]) if len(ground_inliers) \
        else 0.0
    in_idcs = np.where(ground_inliers.points[:, 2]
                       < (mean_height + cfg.mean_height))[0]
    cut_ground = ground_inliers.select_by_index(in_idcs)
    cut_ground.paint_uniform_color([0, 0, 0])
    merged_chunk = pcd_chunk + cut_ground

    glabels = chunk_downsample_dict["kitti_labels"]["ground"]
    inst_ground = glabels["instance"][sequence][inliers][in_idcs]
    seg_ground = glabels["semantic"][sequence][inliers][in_idcs]
    return merged_chunk, pcd_chunk, cut_ground, inst_ground, seg_ground
