"""Batched per-map chunk processing: all chunk graphs of a map cluster in
one device dispatch.

The reference (and our run_pipeline default) processes chunks one at a time
(run_pipeline.py:160-195). On TPU the NCut worklist is most efficient when
many chunk graphs share the device-resident queue (idle batch slots in deep
recursion chains get filled by other chunks' nodes), so this runner:

  1. builds all chunk affinities (Pallas) into one padded [C, N, N] stack,
  2. clusters every chunk in a single recursive_ncut_device dispatch,
  3. reprojects labels / assembles per-chunk outputs exactly like
     ncuts_chunk.

Drop-in: produces the same per-chunk tuples as pipeline.ncuts_chunk.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

from autoinst_tpu.ncuts.device_solver import (device_tier_cap,
                                              finish_ncut_device,
                                              recursive_ncut_device_async)
from autoinst_tpu.ncuts.solver import recursive_ncut_batch
from autoinst_tpu.pipeline.chunking import (get_indices_feature_reprojection,
                                            statistical_inlier_indices,
                                            tarl_features_per_patch)
from autoinst_tpu.pipeline.ncuts_chunk import (chunk_affinity,
                                               kdtree_1nn_reprojection)
from autoinst_tpu.utils.colors import generate_random_colors


def ncuts_chunks_batched(dataset, chunk_downsample_dict, pcd_nonground_minor,
                         T_pcd, sampled_indices_global, cfg,
                         patchwise_indices=None, group: int = 16):
    """Segment ALL chunks of a map; yields per-chunk tuples in order:
    (merged_chunk, pcd_chunk, cut_ground, inst_ground, seg_ground)."""
    weights = cfg.config
    n_chunks = len(chunk_downsample_dict["center_ids"])

    def affinity_inputs(sequence):
        """Host-side inputs for one chunk: points + reprojected TARL."""
        chunk_major = chunk_downsample_dict[
            "pcd_nonground_chunks_major_downsampling"][sequence]
        points_major = np.asarray(chunk_major.points, np.float32)
        tarl_features = None
        if weights["theta"]:
            center_id = chunk_downsample_dict["center_ids"][sequence]
            center_position = chunk_downsample_dict["center_positions"][
                sequence]
            tarl_idx, _ = get_indices_feature_reprojection(
                sampled_indices_global, center_id,
                adjacent_frames=cfg.adjacent_frames_tarl)
            tarl_features = tarl_features_per_patch(
                dataset, chunk_major, T_pcd, center_position, tarl_idx,
                cfg.chunk_size, search_radius=cfg.major_voxel_size / 2.0,
                norm=cfg.tarl_norm)
        return points_major, tarl_features

    # padded affinity widths are a pure function of chunk point counts
    # (ncuts_chunk._pad_multiple), so grouping needs NO device work upfront
    tile = cfg.affinity_tile
    sizes = [len(chunk_downsample_dict[
        "pcd_nonground_chunks_major_downsampling"][s].points)
        for s in range(n_chunks)]
    widths = [max(((n + tile - 1) // tile) * tile, tile) for n in sizes]

    labels_all = [None] * n_chunks
    on_device = (jax.default_backend() == "tpu" and getattr(
        cfg, "ncut_backend", "auto") in ("auto", "device"))
    # Chunks wider than the largest device-solver tier would force
    # recursive_ncut_device's host fallback; with uniform padding that
    # would silently drop EVERY group to the CPU solver. Solve outsized
    # chunks individually on the host and keep the device batch tight.
    tier_cap = device_tier_cap()
    oversized = [i for i in range(n_chunks)
                 if on_device and widths[i] > tier_cap]
    for i in oversized:
        print(f"[batch_runner] chunk {i} has {widths[i]} nodes "
              f"(> device tier cap {tier_cap}); host-solver fallback",
              flush=True)
        points_major, tarl_features = affinity_inputs(i)
        A, n = chunk_affinity(points_major, cfg, tarl_features)
        labels_all[i] = recursive_ncut_batch(
            jnp.asarray(A)[None], [n],
            T=weights["T"], split_lim=cfg.split_lim,
            method=cfg.ncut_method)[0]
    remaining = [i for i in range(n_chunks) if i not in set(oversized)]
    max_pad = max((widths[i] for i in remaining), default=0)
    order = sorted(remaining, key=lambda i: widths[i])
    groups = [order[lo:lo + group] for lo in range(0, len(order), group)]

    def build_group(idxs):
        """Affinities for one chunk group, padded to the group stack.

        On device the per-chunk [w_i, w_i] affinity is zero-padded to the
        uniform width ON DEVICE (jnp.pad of a device-resident array) --
        round-tripping it through np.asarray cost 2x the full matrix over
        the ~17 MB/s tunnel per chunk, which dwarfed the solve itself."""
        width = max_pad if on_device else max(widths[i] for i in idxs)
        # uniform width + row count across groups: ONE compiled solver
        # executable per map run. The axon TPU transport cannot reliably
        # re-execute a large executable once a later one has been compiled
        # in the same process (CLAUDE.md), and remote-compiled programs are
        # not covered by the persistent cache -- per-group shapes would
        # compile a fresh multi-minute executable per group.
        n_rows = group if (on_device and len(order) > group) else len(idxs)
        rows, row_nums = [], []
        for i in idxs:
            points_major, tarl_features = affinity_inputs(i)
            A, n = chunk_affinity(points_major, cfg, tarl_features)
            row_nums.append(n)
            if on_device:
                rows.append(jnp.pad(A, ((0, width - A.shape[0]),
                                        (0, width - A.shape[1]))))
            else:
                a = np.zeros((width, width), np.float32)
                aa = np.asarray(A)
                a[:aa.shape[0], :aa.shape[1]] = aa
                rows.append(a)
        # pad the last partial group with trivial 1-node graphs (same batch
        # signature -> same executable as the full groups)
        row_nums += [1] * (n_rows - len(idxs))
        if on_device:
            rows += [jnp.zeros((width, width), jnp.float32)
                     ] * (n_rows - len(idxs))
            stack = jnp.stack(rows)
        else:
            rows += [np.zeros((width, width), np.float32)
                     ] * (n_rows - len(idxs))
            stack = jnp.asarray(np.stack(rows))
        return stack, row_nums

    # phase 2: grouped device dispatches, double-buffered -- group k+1's
    # host work (TARL reprojection) and uploads happen while group k's
    # worklist runs on chip (VERDICT r3 #5)
    nxt = build_group(groups[0]) if groups else None
    for gi, idxs in enumerate(groups):
        stack, row_nums = nxt
        handle = None
        if on_device:
            handle = recursive_ncut_device_async(
                stack, row_nums, T=weights["T"], split_lim=cfg.split_lim)
        nxt = build_group(groups[gi + 1]) if gi + 1 < len(groups) else None
        if on_device:
            labs = finish_ncut_device(handle)
        else:
            labs = recursive_ncut_batch(
                stack, row_nums,
                T=weights["T"], split_lim=cfg.split_lim,
                method=cfg.ncut_method)
        for j, i in enumerate(idxs):
            labels_all[i] = labs[j]

    # phase 3: per-chunk label reprojection + ground assembly (host)
    for sequence in range(n_chunks):
        # fresh palette per chunk (advancing the global RNG like the
        # sequential path, ncuts_utils.py:177) so colors never collide
        # across chunks before the merge association
        random_colors = generate_random_colors(600)
        labels = labels_all[sequence]
        chunk_major = chunk_downsample_dict[
            "pcd_nonground_chunks_major_downsampling"][sequence]
        pcd_chunk = chunk_downsample_dict["pcd_nonground_chunks"][sequence]
        pcd_ground_chunk = chunk_downsample_dict["pcd_ground_chunks"][
            sequence]

        pcd_color = np.zeros((len(labels), 3))
        for i in np.unique(labels):
            pcd_color[labels == i] = np.array(
                random_colors[int(i) % len(random_colors)]) / 255.0
        pcd_chunk.paint_uniform_color([0, 0, 0])
        colors = kdtree_1nn_reprojection(np.asarray(pcd_chunk.colors),
                                         pcd_chunk, pcd_color, chunk_major)
        pcd_chunk.colors = colors

        inliers = statistical_inlier_indices(pcd_ground_chunk.points)
        ground_in = pcd_ground_chunk.select_by_index(inliers)
        mh = np.mean(ground_in.points[:, 2]) if len(ground_in) else 0.0
        in_idcs = np.where(ground_in.points[:, 2]
                           < (mh + cfg.mean_height))[0]
        cut_ground = ground_in.select_by_index(in_idcs)
        cut_ground.paint_uniform_color([0, 0, 0])
        merged_chunk = pcd_chunk + cut_ground
        glabels = chunk_downsample_dict["kitti_labels"]["ground"]
        inst_ground = glabels["instance"][sequence][inliers][in_idcs]
        seg_ground = glabels["semantic"][sequence][inliers][in_idcs]
        yield (merged_chunk, pcd_chunk, cut_ground, inst_ground, seg_ground)
