"""DINOv2-style dense ViT feature extractor in Flax.

Equivalent of the reference extractor (2D-VFMs/dinov2/extractor.py:14-360,
run.py defaults): dinov2_vits14 (ViT-S/14 with LayerScale) whose patch
embedding runs at stride 7 instead of 14 (denser token grid,
extractor.py:102-121), bicubically-interpolated positional embeddings
(extractor.py:66-99), emitting the raw output of block index 10 ("token"
facet, layer 10 -- run.py:56, hook at extractor.py:193-195; NO final
LayerNorm is applied by the hook) reshaped to (h, w, 384): the
.npz[feature_map] cache contract (kitti_odometry_dataset.py:224-249).

Preprocessing parity (extractor.py:125-156): center-pad the image to the
next multiple of the patch size (reference rounding: left/top get the
ceil half), scale to [0,1], normalize with mean=std=0.5.

Weights: `convert_dinov2_state_dict` maps the published torch.hub
checkpoint (exported to npz or loaded via torch) onto this tree;
`load_npz_weights` loads a converted flat npz. Randomly-initialized
weights exercise the full pipeline otherwise (zero-egress environments
cannot fetch the checkpoint).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp
from flax import linen as nn


class Attention(nn.Module):
    dim: int
    heads: int

    @nn.compact
    def __call__(self, x):
        b, n, d = x.shape
        qkv = nn.Dense(3 * d, name="qkv")(x).reshape(b, n, 3, self.heads,
                                                     d // self.heads)
        q, k, v = qkv[:, :, 0], qkv[:, :, 1], qkv[:, :, 2]
        q = q.transpose(0, 2, 1, 3)
        k = k.transpose(0, 2, 1, 3)
        v = v.transpose(0, 2, 1, 3)
        attn = jax.nn.softmax(
            jnp.einsum("bhqd,bhkd->bhqk", q, k) / np.sqrt(d // self.heads),
            axis=-1)
        out = jnp.einsum("bhqk,bhkd->bhqd", attn, v)
        out = out.transpose(0, 2, 1, 3).reshape(b, n, d)
        return nn.Dense(d, name="proj")(out)


class Block(nn.Module):
    """Pre-norm ViT block with LayerScale (dinov2 ls1/ls2 gammas)."""
    dim: int
    heads: int
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x):
        g1 = self.param("gamma1", nn.initializers.ones, (self.dim,))
        g2 = self.param("gamma2", nn.initializers.ones, (self.dim,))
        h = Attention(self.dim, self.heads, name="attn")(
            nn.LayerNorm(name="norm1")(x))
        x = x + g1 * h
        y = nn.LayerNorm(name="norm2")(x)
        y = nn.Dense(self.dim * self.mlp_ratio, name="fc1")(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim, name="fc2")(y)
        return x + g2 * y


def _cubic_weights(t: jax.Array, A: float = -0.75):
    """torch bicubic convolution weights (cubic_convolution1/2, A=-0.75)
    for the 4 taps at offsets [-1, 0, 1, 2] around floor(src)."""
    def k(x):
        ax = jnp.abs(x)
        w1 = ((A + 2) * ax - (A + 3)) * ax * ax + 1          # |x| <= 1
        w2 = (((ax - 5) * ax + 8) * ax - 4) * A              # 1 < |x| < 2
        return jnp.where(ax <= 1, w1, jnp.where(ax < 2, w2, 0.0))
    return jnp.stack([k(t + 1), k(t), k(1 - t), k(2 - t)], axis=-1)


def _bicubic_1d(x: jax.Array, out_len: int, scale: float, axis: int):
    """torch F.interpolate bicubic along one axis (align_corners=False,
    scale passed directly i.e. recompute_scale_factor=False): source
    coordinate (i + 0.5)/scale - 0.5, border-clamped 4-tap cubic."""
    g = x.shape[axis]
    dst = jnp.arange(out_len, dtype=jnp.float32)
    src = (dst + 0.5) / scale - 0.5
    i0 = jnp.floor(src)
    t = src - i0
    w = _cubic_weights(t)                                    # [out, 4]
    idx = jnp.clip(i0[:, None].astype(jnp.int32)
                   + jnp.arange(-1, 3)[None, :], 0, g - 1)   # [out, 4]
    taps = jnp.take(x, idx.reshape(-1), axis=axis)
    shape = list(x.shape)
    shape[axis:axis + 1] = [out_len, 4]
    taps = taps.reshape(shape)
    wshape = [1] * len(shape)
    wshape[axis], wshape[axis + 1] = out_len, 4
    return jnp.sum(taps * w.reshape(wshape), axis=axis + 1)


def _torch_bicubic_pos_resize(grid: jax.Array, h: int, w: int) -> jax.Array:
    """Positional-embedding resize exactly matching the reference
    (2D-VFMs/dinov2/extractor.py:73-97): torch bicubic (A=-0.75) with the
    DINO w0+0.1 scale-factor trick -- including the inherited h/w
    transposition quirk: the grid is resized to (w, h) in that axis order
    and flat-added to the (h, w)-ordered tokens. grid [1, g, g, D] ->
    [1, h*w, D]."""
    g = grid.shape[1]
    if h == w == g:   # reference identity shortcut (extractor.py:76-77)
        return grid.reshape(1, g * g, grid.shape[-1])
    out = _bicubic_1d(grid, w, (w + 0.1) / g, axis=1)
    out = _bicubic_1d(out, h, (h + 0.1) / g, axis=2)
    return out.reshape(1, h * w, grid.shape[-1])


class ViTDense(nn.Module):
    dim: int = 384           # ViT-S
    heads: int = 6
    depth: int = 12
    patch: int = 14
    pos_grid: int = 37       # dinov2 518/14 pretraining grid
    facet_block: int = 10    # raw output of blocks[10] (run.py layer=10)

    @nn.compact
    def __call__(self, images, stride: int = 7):
        """images [B, H, W, 3] float, ALREADY normalized; returns
        [B, h, w, dim] with h = (H - patch)//stride + 1."""
        b, H, W, _ = images.shape
        kernel = self.param("patch_kernel", nn.initializers.lecun_normal(),
                            (self.patch, self.patch, 3, self.dim))
        bias = self.param("patch_bias", nn.initializers.zeros, (self.dim,))
        x = jax.lax.conv_general_dilated(
            images, kernel, window_strides=(stride, stride),
            padding="VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        x = x + bias
        h, w = x.shape[1], x.shape[2]
        x = x.reshape(b, h * w, self.dim)

        cls = self.param("cls_token", nn.initializers.zeros, (1, 1, self.dim))
        g = self.pos_grid
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, g * g + 1, self.dim))
        grid = pos[:, 1:].reshape(1, g, g, self.dim)
        x = x + _torch_bicubic_pos_resize(grid, h, w)
        x = jnp.concatenate([jnp.tile(cls + pos[:, :1], (b, 1, 1)), x],
                            axis=1)

        out = None
        for i in range(self.depth):
            x = Block(self.dim, self.heads, name=f"block_{i}")(x)
            if i == self.facet_block:
                out = x
        # token facet = the block's raw output (the reference hooks the
        # block forward, extractor.py:193-195; no final norm applied)
        return out[:, 1:].reshape(b, h, w, self.dim)


def convert_dinov2_state_dict(state: dict, template_variables,
                              depth: int = 12):
    """Map a dinov2_vits14 torch state dict (hub checkpoint tensors as
    numpy) onto the ViTDense parameter tree.

    Key layout (facebookresearch/dinov2 DinoVisionTransformer):
      cls_token [1,1,D], pos_embed [1,G*G+1,D],
      patch_embed.proj.weight [D,3,p,p] / .bias,
      blocks.i.{norm1,norm2}.{weight,bias}, blocks.i.attn.qkv.{weight,bias},
      blocks.i.attn.proj.{weight,bias}, blocks.i.ls{1,2}.gamma,
      blocks.i.mlp.fc{1,2}.{weight,bias}.
    (mask_token and the final norm are unused by the token facet.)
    """
    import flax
    params = dict(flax.traverse_util.flatten_dict(
        template_variables["params"], sep="/"))

    def get(name):
        if name not in state:
            raise KeyError(f"dinov2 checkpoint missing {name}")
        return np.asarray(state[name])

    def put(path, value):
        if path not in params:
            raise KeyError(f"no flax parameter {path}")
        if params[path].shape != value.shape:
            raise ValueError(f"{path}: shape {params[path].shape} != "
                             f"{value.shape}")
        params[path] = value.astype(np.float32)

    put("cls_token", get("cls_token"))
    put("pos_embed", get("pos_embed"))
    # torch conv weight [D, 3, p, p] -> HWIO [p, p, 3, D]
    put("patch_kernel", get("patch_embed.proj.weight").transpose(2, 3, 1, 0))
    put("patch_bias", get("patch_embed.proj.bias"))
    for i in range(depth):
        tb, fb = f"blocks.{i}", f"block_{i}"
        put(f"{fb}/norm1/scale", get(f"{tb}.norm1.weight"))
        put(f"{fb}/norm1/bias", get(f"{tb}.norm1.bias"))
        put(f"{fb}/norm2/scale", get(f"{tb}.norm2.weight"))
        put(f"{fb}/norm2/bias", get(f"{tb}.norm2.bias"))
        put(f"{fb}/attn/qkv/kernel", get(f"{tb}.attn.qkv.weight").T)
        put(f"{fb}/attn/qkv/bias", get(f"{tb}.attn.qkv.bias"))
        put(f"{fb}/attn/proj/kernel", get(f"{tb}.attn.proj.weight").T)
        put(f"{fb}/attn/proj/bias", get(f"{tb}.attn.proj.bias"))
        put(f"{fb}/gamma1", get(f"{tb}.ls1.gamma"))
        put(f"{fb}/gamma2", get(f"{tb}.ls2.gamma"))
        put(f"{fb}/fc1/kernel", get(f"{tb}.mlp.fc1.weight").T)
        put(f"{fb}/fc1/bias", get(f"{tb}.mlp.fc1.bias"))
        put(f"{fb}/fc2/kernel", get(f"{tb}.mlp.fc2.weight").T)
        put(f"{fb}/fc2/bias", get(f"{tb}.mlp.fc2.bias"))

    return {"params": flax.traverse_util.unflatten_dict(
        {tuple(k.split("/")): jnp.asarray(v) for k, v in params.items()})}


def expected_dinov2_keys(depth: int = 12):
    keys = ["cls_token", "pos_embed", "patch_embed.proj.weight",
            "patch_embed.proj.bias"]
    for i in range(depth):
        tb = f"blocks.{i}"
        keys += [f"{tb}.norm1.weight", f"{tb}.norm1.bias",
                 f"{tb}.norm2.weight", f"{tb}.norm2.bias",
                 f"{tb}.attn.qkv.weight", f"{tb}.attn.qkv.bias",
                 f"{tb}.attn.proj.weight", f"{tb}.attn.proj.bias",
                 f"{tb}.ls1.gamma", f"{tb}.ls2.gamma",
                 f"{tb}.mlp.fc1.weight", f"{tb}.mlp.fc1.bias",
                 f"{tb}.mlp.fc2.weight", f"{tb}.mlp.fc2.bias"]
    return keys


def pad_to_patch_multiple(image: np.ndarray, patch: int = 14) -> np.ndarray:
    """Center-pad H and W to the NEXT multiple of `patch` (reference
    _get_padding, extractor.py:142-156: always adds at least one pixel
    row/col; odd padding puts the extra pixel on the left/top)."""
    h, w = image.shape[:2]
    new_w = (w // patch + 1) * patch
    new_h = (h // patch + 1) * patch
    hp, vp = (new_w - w) / 2, (new_h - h) / 2
    l_pad = int(hp if hp % 1 == 0 else hp + 0.5)
    r_pad = int(hp if hp % 1 == 0 else hp - 0.5)
    t_pad = int(vp if vp % 1 == 0 else vp + 0.5)
    b_pad = int(vp if vp % 1 == 0 else vp - 0.5)
    return np.pad(image, ((t_pad, b_pad), (l_pad, r_pad), (0, 0)))


class ViTDenseExtractor:
    mean = 0.5  # reference extractor.py:48-49
    std = 0.5

    def __init__(self, stride: int = 7, weights_path: str = ""):
        self.stride = stride
        self.model = ViTDense()
        self.variables = None
        if weights_path:
            self.load_npz_weights(weights_path)
        self._apply = jax.jit(
            lambda v, img: self.model.apply(v, img, stride=self.stride))

    def _init(self, images):
        self.variables = self.model.init(jax.random.PRNGKey(0), images,
                                         stride=self.stride)

    def load_npz_weights(self, path: str):
        """Load a converted checkpoint (flat npz of the flax param tree) OR
        a raw dinov2 torch export (flat npz of torch names)."""
        import flax
        flat = dict(np.load(path))
        if "patch_embed.proj.weight" in flat:   # torch-name export
            probe = np.zeros((1, 14 * 3, 14 * 3, 3), np.float32)
            template = self.model.init(jax.random.PRNGKey(0),
                                       jnp.asarray(probe),
                                       stride=self.stride)
            self.variables = convert_dinov2_state_dict(flat, template)
            return
        tree = flax.traverse_util.unflatten_dict(
            {tuple(k.split("/")): jnp.asarray(v) for k, v in flat.items()})
        self.variables = {"params": tree}

    def load_torch_checkpoint(self, path: str):
        """Convert a locally-available dinov2_vits14 .pth directly."""
        import torch
        sd = torch.load(path, map_location="cpu", weights_only=False)
        sd = sd.get("model", sd) if isinstance(sd, dict) else sd
        state = {k: v.numpy() for k, v in sd.items()
                 if hasattr(v, "numpy")}
        probe = np.zeros((1, 14 * 3, 14 * 3, 3), np.float32)
        template = self.model.init(jax.random.PRNGKey(0),
                                   jnp.asarray(probe), stride=self.stride)
        self.variables = convert_dinov2_state_dict(state, template)
        return self.variables

    def extract(self, image: np.ndarray) -> np.ndarray:
        """image [H, W, 3] uint8/float -> (h, w, 384) feature map."""
        img = np.asarray(image, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
        img = pad_to_patch_multiple(img, self.model.patch)
        img = (img - self.mean) / self.std
        img = img[None]
        if self.variables is None:
            self._init(jnp.asarray(img))
        return np.asarray(self._apply(self.variables, jnp.asarray(img))[0])

    def run_on_folder(self, dataset, cam: str, out_dir: str, indices=None):
        """Write the .npz[feature_map] caches the pipeline reads."""
        import os
        os.makedirs(out_dir, exist_ok=True)
        indices = indices if indices is not None else range(len(dataset))
        for i in indices:
            image = dataset.get_image(cam, i)
            if image is None:
                continue
            fmap = self.extract(np.asarray(image))
            np.savez(os.path.join(out_dir, f"{i:06d}.npz"), feature_map=fmap)
