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


def make_scene_objects(rng, n_objects=4, span=30.0, varied=False,
                       adjacent_pairs=0, pair_gap=(0.9, 1.4)):
    """Objects as (center, size[, kind]) tuples. varied=True mixes boxes
    (cars), cylinders (trunks) and thin walls; adjacent_pairs adds pairs
    of objects pair_gap apart surface-to-surface (the case spatial-only
    NCut tends to merge; gaps straddling the 1.0 m proximity threshold
    make the merge borderline, flipping per view)."""
    objs = []
    for i in range(n_objects):
        center = np.array([6.0 + i * span / n_objects,
                           rng.uniform(-7, 7), -SENSOR_H + 0.9])
        size = rng.uniform(1.2, 2.4, size=3)
        kind = rng.choice(["box", "cyl", "wall"]) if varied else "box"
        if kind == "wall":
            size = np.array([rng.uniform(2.5, 4.0), 0.3,
                             rng.uniform(1.4, 2.2)])
        objs.append((center, size, kind))
    for p in range(adjacent_pairs):
        base = np.array([9.0 + p * span / max(adjacent_pairs, 1),
                         rng.uniform(-6, 6), -SENSOR_H + 0.8])
        sz = rng.uniform(1.2, 2.0, size=3)
        gap = sz[1] / 2 + rng.uniform(*pair_gap)
        objs.append((base, sz, "box"))
        objs.append((base + np.array([0.0, gap + sz[1] / 2, 0.0]),
                     rng.uniform(1.2, 2.0, size=3), "box"))
    return objs


def add_large_objects(rng, objs, n_large, span=30.0):
    """Bus/tram-scale boxes (6-9 m long): elongated uniform clusters that
    proximity-graph NCut tends to OVER-segment (the chain cut through a
    long object's cross-section is cheap), the second real failure mode
    next to adjacent-pair merging."""
    for i in range(n_large):
        center = np.array([12.0 + (i + 0.3) * span / max(n_large, 1),
                           rng.uniform(-8, 8), -SENSOR_H + 1.3])
        size = np.array([rng.uniform(6.0, 9.0), rng.uniform(2.2, 2.6),
                         rng.uniform(2.4, 3.0)])
        if rng.uniform() < 0.5:
            size[[0, 1]] = size[[1, 0]]  # half run crosswise
        objs.append((center, size, "box"))
    return objs


def _obj_points(rng, center, size, n, kind="box"):
    if kind == "cyl":
        ang = rng.uniform(0, 2 * np.pi, n)
        r = size[0] / 2 * np.sqrt(rng.uniform(0, 1, n))
        z = rng.uniform(-0.5, 0.5, n) * size[2]
        return center + np.stack([r * np.cos(ang), r * np.sin(ang), z], 1)
    return center + rng.uniform(-0.5, 0.5, size=(n, 3)) * size


def _box_points(rng, center, size, n):
    return _obj_points(rng, center, size, n, "box")


def make_clutter(rng, n_clutter, span=30.0):
    """Small scene clutter: poles (thin vertical cylinders) and bushes
    (gaussian blobs), 15-80 points each — the singleton-component noise
    real chunks have after ground removal."""
    items = []
    for _ in range(n_clutter):
        kind = rng.choice(["pole", "bush"])
        center = np.array([rng.uniform(2.0, 6.0 + span),
                           rng.uniform(-10, 10), -SENSOR_H + 0.7])
        if kind == "pole":
            size = np.array([0.15, 0.15, rng.uniform(1.5, 3.0)])
            n = int(rng.integers(15, 45))
        else:
            size = rng.uniform(0.4, 1.1, size=3)
            n = int(rng.integers(25, 80))
        items.append((center, size, "cyl" if kind == "pole" else "box", n))
    return items


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
                      with_moving=True, tarl=True, cams=False,
                      varied_objects=False, adjacent_pairs=0, n_clutter=0,
                      ring_ground=False, density_falloff=False,
                      object_span=None, paired_tarl=False,
                      tarl_noise=0.0, pair_gap=(0.9, 1.4), n_large=0):
    """Write sequence 00 under `root`. Returns (poses_velo, objects).

    Realism knobs (all default-off, keeping the original easy scenes):
    varied_objects/adjacent_pairs (shape mix + near-adjacent instance
    pairs), n_clutter (poles/bushes, the small-component noise of real
    ground-removed chunks), ring_ground (HDL-64-style beam-elevation ring
    sampling of the ground -> 1/r density falloff + ring structure),
    density_falloff (object point counts scale ~(10/r)^1.5 with sensor
    distance)."""
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

    # object_span: x-extent of object placement. Default (None) keeps the
    # historical 30 m cluster near the origin; pass ~n_scans*step to spread
    # objects along the whole trajectory (otherwise every chunk past the
    # first is pure ground and map metrics hinge on one chunk).
    span = 30.0 if object_span is None else float(object_span)
    objects = make_scene_objects(rng, n_objects=n_objects, span=span,
                                 varied=varied_objects,
                                 adjacent_pairs=adjacent_pairs,
                                 pair_gap=pair_gap)
    if n_large:
        objects = add_large_objects(rng, objects, n_large, span=span)
    clutter = make_clutter(rng, n_clutter, span=span) if n_clutter else []

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

        if ring_ground:
            # HDL-64-style: ground hit radius set by beam elevation
            # (r = h / tan(-elev)), 64 elevation bins -> concentric rings
            # with 1/r density falloff, like a real flat-road scan
            elev = np.deg2rad(np.linspace(-24.8, -2.0, 64))
            radii = SENSOR_H / np.tan(-elev)
            radii = radii[(radii >= 3.0) & (radii <= 45.0)]
            per_ring = max(8, ground_points // max(len(radii), 1))
            ang = rng.uniform(0, 2 * np.pi, (len(radii), per_ring))
            rad = (radii[:, None]
                   + rng.normal(scale=0.03, size=ang.shape))
            ang, rad = ang.ravel(), rad.ravel()
        else:
            # annulus 3..20 m around the sensor in world frame
            ang = rng.uniform(0, 2 * np.pi, ground_points)
            rad = rng.uniform(3.5, 20.0, ground_points)
        gx = t[0] + rad * np.cos(ang)
        gy = rad * np.sin(ang)
        gz = -SENSOR_H + rng.normal(scale=0.02, size=len(rad))
        ground = np.stack([gx, gy, gz], axis=1)
        g_sem = np.full(len(rad), GROUND_SEM, np.uint32)
        g_inst = np.zeros(len(rad), np.uint32)

        pts_w = [ground]
        sems = [g_sem]
        insts = [g_inst]

        def _n_visible(center, n_base):
            if not density_falloff:
                return n_base
            r = max(np.linalg.norm(center[:2] - t[:2]), 3.0)
            return max(12, int(n_base * min(1.0, (10.0 / r) ** 1.5)))

        for oid, obj in enumerate(objects):
            center, size, kind = (obj if len(obj) == 3
                                  else (obj[0], obj[1], "box"))
            p = _obj_points(rng, center, size,
                            _n_visible(center, points_per_object), kind)
            pts_w.append(p)
            sems.append(np.full(len(p), OBJECT_SEM, np.uint32))
            insts.append(np.full(len(p), oid + 1, np.uint32))
        for cid, (center, size, kind, n) in enumerate(clutter):
            p = _obj_points(rng, center, size, _n_visible(center, n), kind)
            pts_w.append(p)
            # vegetation/pole semantics, instance ids above the objects
            sems.append(np.full(len(p), 70 if kind == "box" else 80,
                                np.uint32))
            insts.append(np.full(len(p), 200 + cid, np.uint32))
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
            # features that separate objects: object id one-hot-ish pattern.
            # paired_tarl: members of an adjacent pair SHARE one feature dim
            # (real TARL cannot tell two adjacent same-class objects apart;
            # per-instance one-hots are an unrealistic oracle that lets the
            # TARL affinity term split pairs spatial cuts would merge).
            # tarl_noise adds per-point gaussian jitter for the same reason.
            feats = np.zeros((len(pts_s), 96), np.float32)
            feats[:, 0] = 0.1
            pairs_end = n_objects + (len(objects) - n_objects - n_large)
            for oid in range(len(objects)):
                dim = oid
                if paired_tarl and n_objects <= oid < pairs_end:
                    dim = n_objects + (oid - n_objects) // 2
                elif paired_tarl and oid >= pairs_end:
                    dim = n_objects + (pairs_end - n_objects) // 2 \
                        + (oid - pairs_end)
                feats[insts == oid + 1, dim + 1] = 1.0
            if tarl_noise:
                feats += rng.normal(scale=tarl_noise,
                                    size=feats.shape).astype(np.float32)
            with open(os.path.join(tarl_dir, f"{s:06d}.bin"), "wb") as fh:
                fh.write(zlib.compress(feats.tobytes()))

    if cams:
        generate_camera_data(root, n_scans)

    # cam0 poses file (world = cam frame of scan 0 here)
    with open(os.path.join(root, "poses", "00.txt"), "w") as fh:
        for T in poses_cam:
            fh.write(" ".join(str(v) for v in T[:3, :4].ravel()) + "\n")

    return np.array(poses_velo), objects
