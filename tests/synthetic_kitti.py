"""Generate a miniature synthetic SemanticKITTI-format sequence on disk.

Scene: a flat ground plane plus box-shaped "objects" at fixed world
positions; the sensor drives along +x. Written in the exact on-disk layout
the KITTI odometry reader expects (velodyne .bin, .label uint32, calib.txt,
poses, zlib TARL caches), so the same fixture drives reader unit tests and
the end-to-end pipeline test.
"""

import os
import zlib

import numpy as np

GROUND_SEM = 40  # road
OBJECT_SEM = 10  # car
MOVING_SEM = 252  # moving-car (must be dropped by the MO filter)


SENSOR_H = 1.723  # sensor height above ground (KITTI velodyne mount)


def make_scene_objects(rng, n_objects=4, span=30.0):
    objs = []
    for i in range(n_objects):
        center = np.array([6.0 + i * span / n_objects,
                           rng.uniform(-7, 7), -SENSOR_H + 0.9])
        size = rng.uniform(1.2, 2.4, size=3)
        objs.append((center, size))
    return objs


def _box_points(rng, center, size, n):
    return center + rng.uniform(-0.5, 0.5, size=(n, 3)) * size


def generate_camera_data(root, n_scans, img_w=128, img_h=40,
                         dino_dim=384, n_sam_masks=3, seed=1):
    """Synthetic cam2 images + DINOv2 feature maps + SAM masks in the
    reader's on-disk cache layout."""
    from PIL import Image
    rng = np.random.default_rng(seed)
    img_dir = os.path.join(root, "sequences", "00", "image_2")
    dino_dir = os.path.join(root, "dinov2_features", "00", "image_2")
    sam_dir = os.path.join(root, "sam_pred_underseg", "00", "image_2")
    for d in (img_dir, dino_dir, sam_dir):
        os.makedirs(d, exist_ok=True)
    fh, fw = img_h // 7, img_w // 7
    for s in range(n_scans):
        arr = rng.integers(0, 255, size=(img_h, img_w, 3), dtype=np.uint8)
        Image.fromarray(arr).save(os.path.join(img_dir, f"{s:06d}.png"))
        fmap = rng.normal(size=(fh, fw, dino_dim)).astype(np.float32)
        np.savez(os.path.join(dino_dir, f"{s:06d}.npz"), feature_map=fmap)
        masks = []
        for m in range(n_sam_masks):
            seg = np.zeros((img_h, img_w), bool)
            x0 = (m * img_w) // n_sam_masks
            seg[:, x0:x0 + img_w // n_sam_masks] = True
            masks.append({"segmentation": seg})
        np.savez(os.path.join(sam_dir, f"{s:06d}.npz"),
                 masks=np.array(masks, dtype=object))


def generate_sequence(root, n_scans=5, step=2.5, points_per_object=260,
                      ground_points=2400, seed=0, n_objects=4,
                      with_moving=True, tarl=True, cams=False):
    """Write sequence 00 under `root`. Returns (poses_velo, objects)."""
    rng = np.random.default_rng(seed)
    seq = os.path.join(root, "sequences", "00")
    velo_dir = os.path.join(seq, "velodyne")
    label_dir = os.path.join(seq, "labels")
    os.makedirs(velo_dir, exist_ok=True)
    os.makedirs(label_dir, exist_ok=True)
    os.makedirs(os.path.join(root, "poses"), exist_ok=True)
    tarl_dir = os.path.join(root, "tarl_features", "00")
    if tarl:
        os.makedirs(tarl_dir, exist_ok=True)

    objects = make_scene_objects(rng, n_objects=n_objects)

    # KITTI-style velodyne->camera axis permutation (cam z = velo x,
    # cam x = -velo y, cam y = -velo z) + a small mount offset; intrinsics
    # sized for the synthetic 128x40 camera images
    Tr = np.eye(4)
    Tr[:3, :3] = np.array([[0, -1, 0], [0, 0, -1], [1, 0, 0]], float)
    Tr[:3, 3] = [0.0, -0.08, 0.0]
    with open(os.path.join(seq, "calib.txt"), "w") as fh:
        P = "100.0 0.0 64.0 0.0 0.0 100.0 20.0 0.0 0.0 0.0 1.0 0.0"
        for i in range(4):
            fh.write(f"P{i}: {P}\n")
        fh.write("Tr: " + " ".join(str(v) for v in Tr[:3, :4].ravel())
                 + "\n")

    poses_cam = []
    poses_velo = []
    Tr_inv = np.linalg.inv(Tr)
    for s in range(n_scans):
        t = np.array([s * step, 0.0, 0.0])
        T = np.eye(4)
        T[:3, 3] = t
        poses_velo.append(T)
        # reader reconstructs T_w_velo = Tr^-1 @ T_w_cam0 @ Tr
        poses_cam.append(Tr @ T @ Tr_inv)

        # ground: annulus 3..20 m around the sensor in world frame
        ang = rng.uniform(0, 2 * np.pi, ground_points)
        rad = rng.uniform(3.5, 20.0, ground_points)
        gx = t[0] + rad * np.cos(ang)
        gy = rad * np.sin(ang)
        gz = -SENSOR_H + rng.normal(scale=0.02, size=ground_points)
        ground = np.stack([gx, gy, gz], axis=1)
        g_sem = np.full(ground_points, GROUND_SEM, np.uint32)
        g_inst = np.zeros(ground_points, np.uint32)

        pts_w = [ground]
        sems = [g_sem]
        insts = [g_inst]
        for oid, (center, size) in enumerate(objects):
            p = _box_points(rng, center, size, points_per_object)
            pts_w.append(p)
            sems.append(np.full(len(p), OBJECT_SEM, np.uint32))
            insts.append(np.full(len(p), oid + 1, np.uint32))
        if with_moving:
            # a moving car that must vanish after the MO filter
            p = _box_points(rng, np.array([t[0] + 8.0, 3.0, -SENSOR_H + 0.8]),
                            np.array([2.0, 1.5, 1.2]), 150)
            pts_w.append(p)
            sems.append(np.full(len(p), MOVING_SEM, np.uint32))
            insts.append(np.full(len(p), 99, np.uint32))

        pts_w = np.concatenate(pts_w)
        sems = np.concatenate(sems)
        insts = np.concatenate(insts)

        # to scan frame
        Tinv = np.linalg.inv(T)
        pts_s = pts_w @ Tinv[:3, :3].T + Tinv[:3, 3]
        order = rng.permutation(len(pts_s))
        pts_s, sems, insts = pts_s[order], sems[order], insts[order]

        scan = np.concatenate(
            [pts_s, rng.uniform(0, 1, size=(len(pts_s), 1))],
            axis=1).astype(np.float32)
        scan.tofile(os.path.join(velo_dir, f"{s:06d}.bin"))
        labels = (insts.astype(np.uint32) << 16) | sems.astype(np.uint32)
        labels.tofile(os.path.join(label_dir, f"{s:06d}.label"))

        if tarl:
            # features that separate objects: object id one-hot-ish pattern
            feats = np.zeros((len(pts_s), 96), np.float32)
            feats[:, 0] = 0.1
            for oid in range(len(objects)):
                feats[insts == oid + 1, oid + 1] = 1.0
            with open(os.path.join(tarl_dir, f"{s:06d}.bin"), "wb") as fh:
                fh.write(zlib.compress(feats.tobytes()))

    if cams:
        generate_camera_data(root, n_scans)

    # cam0 poses file (world = cam frame of scan 0 here)
    with open(os.path.join(root, "poses", "00.txt"), "w") as fh:
        for T in poses_cam:
            fh.write(" ".join(str(v) for v in T[:3, :4].ravel()) + "\n")

    return np.array(poses_velo), objects
