"""DINOv2-style dense ViT feature extractor in Flax.

Equivalent of the reference extractor (2D-VFMs/dinov2/extractor.py:14-360):
a ViT-S/14 whose patch embedding runs at stride 7 instead of 14 (denser
token grid), with bicubically-interpolated positional embeddings, emitting
the layer-10 token facet reshaped to (H/7, W/7, 384) -- the
.npz[feature_map] cache contract (kitti_odometry_dataset.py:224-249).

Weights: the published DINOv2 checkpoint can be converted from an exported
npz via `load_npz_weights` (zero-egress environments cannot fetch it);
randomly-initialized weights exercise the full pipeline otherwise.
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
    dim: int
    heads: int
    mlp_ratio: int = 4

    @nn.compact
    def __call__(self, x):
        h = Attention(self.dim, self.heads, name="attn")(nn.LayerNorm()(x))
        x = x + h
        y = nn.LayerNorm()(x)
        y = nn.Dense(self.dim * self.mlp_ratio)(y)
        y = nn.gelu(y)
        y = nn.Dense(self.dim)(y)
        return x + y


class ViTDense(nn.Module):
    dim: int = 384           # ViT-S
    heads: int = 6
    depth: int = 12
    patch: int = 14
    facet_layer: int = 10    # reference extractor layer-10 tokens

    @nn.compact
    def __call__(self, images, stride: int = 7):
        """images [B, H, W, 3] float in [0,1]; returns [B, h, w, dim] with
        h = (H - patch)//stride + 1."""
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
        # positional embeddings for the nominal 16x16 grid, resized to (h,w)
        pos = self.param("pos_embed", nn.initializers.normal(0.02),
                         (1, 16 * 16 + 1, self.dim))
        grid = pos[:, 1:].reshape(1, 16, 16, self.dim)
        grid = jax.image.resize(grid, (1, h, w, self.dim), "bicubic")
        x = x + grid.reshape(1, h * w, self.dim)
        x = jnp.concatenate([jnp.tile(cls + pos[:, :1], (b, 1, 1)), x],
                            axis=1)

        out = None
        for i in range(self.depth):
            x = Block(self.dim, self.heads, name=f"block_{i}")(x)
            if i == self.facet_layer - 1:
                out = x
        out = nn.LayerNorm(name="norm")(out)
        return out[:, 1:].reshape(b, h, w, self.dim)


class ViTDenseExtractor:
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
        """Load a converted checkpoint (flat npz of the flax param tree)."""
        import flax
        flat = dict(np.load(path))
        tree = flax.traverse_util.unflatten_dict(
            {tuple(k.split("/")): jnp.asarray(v) for k, v in flat.items()})
        self.variables = {"params": tree}

    def extract(self, image: np.ndarray) -> np.ndarray:
        """image [H, W, 3] uint8/float -> (h, w, 384) feature map."""
        img = np.asarray(image, np.float32)
        if img.max() > 1.5:
            img = img / 255.0
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
