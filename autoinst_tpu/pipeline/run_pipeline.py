"""End-to-end pipeline entry (reference: pipeline/run_pipeline.py:54-243).

Same orchestration: per sequence -> per 1000-scan map -> preprocess stages
(cached) -> per-chunk NCuts (or MaskPLS refinement) -> GT chunk writing ->
self-train export -> chunk merge -> semantic filtering -> metrics.

Run: python -m autoinst_tpu.pipeline.run_pipeline
Configuration via autoinst_tpu.pipeline.config.PipelineConfig (env:
AUTOINST_DATASET_PATH) -- same knobs as the reference config.py.
"""

from __future__ import annotations

import gc
import os

import numpy as np

from autoinst_tpu.datasets import create_kitti_odometry_dataset
from autoinst_tpu.metrics import InstanceMetrics
from autoinst_tpu.pipeline.chunking import indices_per_patch
from autoinst_tpu.pipeline.config import PipelineConfig
from autoinst_tpu.pipeline.merging import (divide_indices_into_chunks,
                                           get_corrected_ground,
                                           merge_chunks_unite_instances,
                                           merge_unite_gt, remove_semantics)
from autoinst_tpu.pipeline.ncuts_chunk import ncuts_chunk
from autoinst_tpu.pipeline.stages import (chunk_and_downsample_point_clouds,
                                          load_and_downsample_point_clouds,
                                          load_downsampled_pcds,
                                          load_subsampled_data,
                                          process_and_save_point_clouds,
                                          subsample_and_extract_positions)
from autoinst_tpu.pipeline.train_export import (store_train_chunks,
                                                write_gt_chunk)
from autoinst_tpu.utils.colors import generate_random_colors_map
from autoinst_tpu.utils.pcd_io import get_merge_pcds, write_pcd
from autoinst_tpu.utils.profiling import stage_timer


def _create_folder(name):
    os.makedirs(name, exist_ok=True)


def run(cfg: PipelineConfig | None = None, dataset_factory=None):
    """Run the full pipeline; returns the last map's metric dict per sequence.

    dataset_factory(seq) -> Dataset allows tests to inject synthetic data.
    """
    cfg = cfg or PipelineConfig()
    weights = cfg.config
    maskpls = None
    if "maskpls" in weights["name"]:
        from autoinst_tpu.models.maskpls.refiner import RefinerModel

    print("Starting with config", weights)
    _create_folder(cfg.out_folder_ncuts)
    _create_folder(cfg.out_folder_instances)
    _create_folder(cfg.out_folder_train)

    results = {}
    for seq in cfg.seqs:
        if seq in cfg.exclude:
            continue
        if cfg.test_map and seq > 0:
            break
        print("Sequence", seq)
        if dataset_factory is not None:
            dataset = dataset_factory(seq)
        elif cfg.dataset_type == "kitti":
            dataset = create_kitti_odometry_dataset(
                cfg.dataset_path, seq, ncuts_mode=True)
        elif cfg.dataset_type == "nuscenes":
            from autoinst_tpu.datasets.nuscenes import (
                NuScenesDatasetConfig, NuScenesOdometryDataset)
            dataset = NuScenesOdometryDataset(
                NuScenesDatasetConfig(dataset_path=cfg.dataset_path), seq)
        elif cfg.dataset_type == "pandaset":
            from autoinst_tpu.datasets.pandaset import (
                PandasetDataset, PandasetDatasetConfig)
            dataset = PandasetDataset(
                PandasetDatasetConfig(dataset_path=cfg.dataset_path), seq)
        else:
            raise ValueError(f"unknown dataset_type {cfg.dataset_type}")
        chunks_idcs = divide_indices_into_chunks(len(dataset), cfg.map_scans)

        data_store_folder = cfg.out_folder + str(seq) + "/"
        _create_folder(data_store_folder)
        data_store_folder_train_cur = cfg.out_folder_train + str(seq) + "/"
        _create_folder(data_store_folder_train_cur)

        metrics = None
        for cidcs in chunks_idcs[cfg.start_chunk:]:
            colors = generate_random_colors_map(6000)
            ind_start, ind_end = cidcs
            cur_idx = int(ind_start / cfg.map_scans)
            if ind_end - ind_start < cfg.min_map_scans:
                continue
            print("map scans", ind_start, "-", ind_end)

            if "maskpls" in weights["name"]:
                maskpls = RefinerModel(dataset=cfg.dataset_type,
                                       weights_path=cfg.maskpls_weights,
                                       **cfg.maskpls_kwargs)

            with stage_timer("stage1_aggregate"):
                process_and_save_point_clouds(
                    dataset, ind_start, ind_end, cfg.out_folder,
                    ground_segmentation_method=cfg.ground_segmentation_method,
                    sequence_num=seq, cur_idx=cur_idx)
            with stage_timer("stage2_downsample"):
                load_and_downsample_point_clouds(
                    cfg.out_folder, seq, cfg.minor_voxel_size,
                    ground_mode=cfg.ground_segmentation_method,
                    cur_idx=cur_idx)

            (pcd_ground_minor, pcd_nonground_minor, kitti_labels_orig,
             instances, all_poses, T_pcd) = load_downsampled_pcds(
                cfg.out_folder, seq, cur_idx)
            first_position = T_pcd[:3, 3]

            with stage_timer("stage3_positions"):
                subsample_and_extract_positions(
                    all_poses, cfg.out_folder, ind_start=ind_start,
                    sequence_num=seq, cur_idx=cur_idx)
            poses, positions, _, sampled_indices_global = \
                load_subsampled_data(cfg.out_folder, seq, cur_idx)

            with stage_timer("stage4_chunking"):
                chunk_downsample_dict = chunk_and_downsample_point_clouds(
                    pcd_nonground_minor, pcd_ground_minor, T_pcd, positions,
                    first_position, sampled_indices_global, cfg.chunk_size,
                    cfg.overlap, cfg.major_voxel_size,
                    kitti_labels=kitti_labels_orig)

            out_folder_ncuts_cur = (cfg.out_folder_ncuts + str(seq) + "_"
                                    + str(cur_idx) + "/")
            out_folder_instances_cur = (cfg.out_folder_instances + str(seq)
                                        + "_" + str(cur_idx) + "/")
            _create_folder(out_folder_ncuts_cur)
            if weights["gt"]:
                _create_folder(out_folder_instances_cur)

            patchwise_indices = indices_per_patch(
                T_pcd, chunk_downsample_dict["center_positions"], positions,
                first_position, sampled_indices_global, cfg.chunk_size)

            n_chunks = len(chunk_downsample_dict["center_ids"])
            batched_iter = None
            if cfg.batched_chunks and "maskpls" not in weights["name"]:
                from autoinst_tpu.pipeline.batch_runner import \
                    ncuts_chunks_batched
                with stage_timer("ncuts_chunks_batched"):
                    batched_iter = iter(list(ncuts_chunks_batched(
                        dataset, chunk_downsample_dict, pcd_nonground_minor,
                        T_pcd, list(sampled_indices_global), cfg,
                        patchwise_indices=patchwise_indices)))
            for sequence in range(cfg.start_seq, n_chunks):
                name = str(chunk_downsample_dict["center_ids"][sequence]
                           ).zfill(6) + ".pcd"
                if batched_iter is not None:
                    (merged_chunk, pcd_chunk, pcd_chunk_ground,
                     inst_ground, seg_ground) = next(batched_iter)
                    pred_pcd = pcd_chunk + pcd_chunk_ground
                elif "maskpls" not in weights["name"]:
                    with stage_timer("ncuts_chunk"):
                        (merged_chunk, pcd_chunk, pcd_chunk_ground,
                         inst_ground, seg_ground) = ncuts_chunk(
                            dataset, chunk_downsample_dict,
                            pcd_nonground_minor, T_pcd,
                            list(sampled_indices_global), cfg,
                            sequence=sequence,
                            patchwise_indices=patchwise_indices)
                    pred_pcd = pcd_chunk + pcd_chunk_ground
                else:
                    pcd_chunk_ground, inst_ground = get_corrected_ground(
                        chunk_downsample_dict, sequence, cfg.mean_height)
                    pred_pcd = maskpls.forward_and_project(
                        chunk_downsample_dict["pcd_nonground_chunks"][sequence]
                        + pcd_chunk_ground)
                    merged_chunk = pred_pcd

                if weights["gt"]:
                    gt_pcd = write_gt_chunk(
                        out_folder_instances_cur, name, chunk_downsample_dict,
                        sequence, colors, instances, pcd_chunk_ground,
                        inst_ground)

                if cfg.gen_self_train_data:
                    store_train_chunks(data_store_folder_train_cur, name,
                                       merged_chunk, gt_pcd,
                                       chunk_downsample_dict, sequence)
                    continue

                write_pcd(out_folder_ncuts_cur, name, pred_pcd)
                gc.collect()

            if cfg.gen_self_train_data:
                if cfg.test_map:
                    break
                continue

            with stage_timer("merge"):
                merge_ncuts = merge_chunks_unite_instances(
                    get_merge_pcds(out_folder_ncuts_cur[:-1]))

            labels_instances = None
            map_instances = None
            if weights["gt"]:
                map_instances = merge_unite_gt(
                    get_merge_pcds(out_folder_instances_cur[:-1]))
                _, labels_instances = np.unique(
                    np.asarray(map_instances.colors), axis=0,
                    return_inverse=True)

            if maskpls is not None:
                maskpls.store_conf_dict(data_store_folder, weights["name"],
                                        seq, cur_idx)

            metrics = InstanceMetrics(
                weights["name"] + " " + str(seq),
                min_points=cfg.metrics_min_points)
            _, labels_ncuts_all = np.unique(
                np.asarray(merge_ncuts.colors), axis=0, return_inverse=True)
            print(f"merged maps: ncuts {len(merge_ncuts.points)} pts / "
                  f"{len(labels_ncuts_all)} labels, gt "
                  f"{len(map_instances.points) if map_instances else 0} pts"
                  f" / {0 if labels_instances is None else len(labels_instances)}"
                  " labels")
            if labels_instances is not None \
                    and len(labels_ncuts_all) != len(labels_instances):
                raise RuntimeError(
                    "merged ncuts/gt maps misaligned: "
                    f"{len(labels_ncuts_all)} vs {len(labels_instances)} "
                    "points -- metrics require identical point order")

            write_pcd(data_store_folder, weights["name"], merge_ncuts,
                      seq, cur_idx)
            write_pcd(data_store_folder, "kitti_instances_", map_instances,
                      seq, cur_idx)

            with stage_timer("metrics"):
                instance_preds = remove_semantics(labels_instances,
                                                  labels_ncuts_all.copy())
                if cfg.canonical_label_order:
                    from autoinst_tpu.metrics.instance_metrics import \
                        canonicalize_label_order
                    labels_ncuts_all, instance_preds = \
                        canonicalize_label_order(labels_ncuts_all,
                                                 labels_ncuts_all,
                                                 instance_preds)
                if maskpls is not None:
                    label_to_confidence = maskpls.label_to_conf(
                        merge_ncuts, instance_preds)
                    # the reference computes confidence-weighted stats and
                    # then immediately recomputes without confidences,
                    # double-accumulating the P/R denominators
                    # (run_pipeline.py:224-238); replicated for parity
                    metrics.update_stats(
                        labels_ncuts_all, instance_preds, labels_instances,
                        confs=label_to_confidence)
                out, aps = metrics.update_stats(
                    labels_ncuts_all, instance_preds, labels_instances)
            results[seq] = {"out": out, "aps": aps}

            if cfg.test_map:
                break

        if metrics is not None:
            results.setdefault(seq, {})["sequence"] = metrics.sequence_stats()
    return results


if __name__ == "__main__":
    run()
