"""Torch-checkpoint converter: reference MaskPLS weights -> this framework.

Maps the reference's torch/MinkowskiEngine parameter layout
(self-training/mask_pls/models/: MinkEncoderDecoder + MaskedTransformerDecoder)
onto our flax trees (backbone.py / decoder.py), layer by layer in build
order:

  * ME conv kernels are stored as [K, Ci, Co] (kernel-volume major); ours
    are [K*Ci, Co] with np.ndindex offset order (last axis fastest). ME's
    hypercube region iterates the FIRST axis fastest, so the K dimension is
    permuted accordingly (documented assumption -- verify against a real
    checkpoint before trusting converted outputs).
  * ME kernel_size=1 convs collapse to [Ci, Co] and map to our Dense skips.
  * torch BatchNorm weight/bias -> scale/bias params; running_mean/var ->
    the batch_stats collection.
  * torch MultiheadAttention in_proj [3D, D] splits into q/k/v Dense
    kernels (transposed); Linear weights transpose into Dense kernels.

Usage: variables = convert_state_dict(torch_state_dict, template_variables)
where torch_state_dict maps names to numpy arrays (export the .ckpt with
`torch.load(...)['state_dict']` and strip the `model.` prefix if present).
"""

from __future__ import annotations

import numpy as np

CS = (32, 32, 64, 128, 256, 256, 128, 96, 96)

# ME hypercube offsets: first axis fastest; ours: np.ndindex (last fastest)
_ME_K3 = [(i, j, k) for k in (-1, 0, 1) for j in (-1, 0, 1)
          for i in (-1, 0, 1)]
_OUR_K3 = [(i - 1, j - 1, k - 1) for i, j, k in np.ndindex(3, 3, 3)]
_PERM_K3 = [_ME_K3.index(o) for o in _OUR_K3]
_ME_K2 = [(i, j, k) for k in (0, 1) for j in (0, 1) for i in (0, 1)]
_OUR_K2 = list(np.ndindex(2, 2, 2))
_PERM_K2 = [_ME_K2.index(tuple(o)) for o in _OUR_K2]


def set_me_region_order(order: str = "first-fastest") -> None:
    """Switch the assumed MinkowskiEngine kernel-offset enumeration.

    "first-fastest" (default; ME's documented hypercube behavior): offsets
    enumerate with the FIRST coordinate axis varying fastest.
    "last-fastest" is the competing hypothesis. The twins cannot settle
    which is real (tests/torch_twin_mink.py:23-26 assumes the converter's
    order); scripts/fingerprint_weights.py runs a released checkpoint
    under both and the coherent one wins."""
    global _ME_K3, _ME_K2, _PERM_K3, _PERM_K2
    if order == "first-fastest":
        _ME_K3 = [(i, j, k) for k in (-1, 0, 1) for j in (-1, 0, 1)
                  for i in (-1, 0, 1)]
        _ME_K2 = [(i, j, k) for k in (0, 1) for j in (0, 1)
                  for i in (0, 1)]
    elif order == "last-fastest":
        _ME_K3 = [(i, j, k) for i in (-1, 0, 1) for j in (-1, 0, 1)
                  for k in (-1, 0, 1)]
        _ME_K2 = [(i, j, k) for i in (0, 1) for j in (0, 1)
                  for k in (0, 1)]
    else:
        raise ValueError(f"unknown region order {order!r}")
    _PERM_K3 = [_ME_K3.index(o) for o in _OUR_K3]
    _PERM_K2 = [_ME_K2.index(tuple(o)) for o in _OUR_K2]


def _conv(src, perm):
    """[K, Ci, Co] ME kernel -> our [K*Ci, Co] with offset reorder."""
    k, ci, co = src.shape
    return src[perm].reshape(k * ci, co)


def _rules_backbone(include_heads: bool = True, scope: str = "backbone"):
    """Ordered (torch_key_base, flax_path, kind) triples for the backbone.

    include_heads=False: the TARL MinkUNet layout
    (Pointcloud-Models/tarl/minkunet.py:84-199) -- identical stem/stage/up
    naming, but no per-level out_bnorm and no sem_head (our
    MinkUNet(voxel_output=True) creates the matching parameter tree)."""
    rules = []
    bn_top = 0  # top-level MaskedBatchNorm counter (call order)
    rb = 0      # ResidualBlock counter

    def bn(torch_base, flax_scope):
        return [(torch_base, flax_scope, "bn")]

    # stem: conv-BN-relu x2 (mink.py:25-32)
    rules += [("stem.0", f"{scope}/SparseConv_0", "conv3")]
    rules += bn("stem.1.bn", f"{scope}/MaskedBatchNorm_{bn_top}"); bn_top += 1
    rules += [("stem.3", f"{scope}/SparseConv_1", "conv3")]
    rules += bn("stem.4.bn", f"{scope}/MaskedBatchNorm_{bn_top}"); bn_top += 1

    def residual(torch_base, rb_idx, has_skip):
        out = [(f"{torch_base}.net.0", f"{scope}/ResidualBlock_{rb_idx}/SparseConv_0", "conv3"),
               (f"{torch_base}.net.1.bn", f"{scope}/ResidualBlock_{rb_idx}/MaskedBatchNorm_0", "bn"),
               (f"{torch_base}.net.3", f"{scope}/ResidualBlock_{rb_idx}/SparseConv_1", "conv3"),
               (f"{torch_base}.net.4.bn", f"{scope}/ResidualBlock_{rb_idx}/MaskedBatchNorm_1", "bn")]
        if has_skip:
            out += [(f"{torch_base}.downsample.0", f"{scope}/ResidualBlock_{rb_idx}/Dense_0", "conv1"),
                    (f"{torch_base}.downsample.1.bn", f"{scope}/ResidualBlock_{rb_idx}/MaskedBatchNorm_2", "bn")]
        return out

    # encoder stages (mink.py:34-56): down conv + 2 residuals
    stage_ch = [(CS[0], CS[1]), (CS[1], CS[2]), (CS[2], CS[3]), (CS[3], CS[4])]
    for s, (cin, cout) in enumerate(stage_ch, start=1):
        rules += [(f"stage{s}.0.net.0", f"{scope}/DownConv_{s-1}", "conv2")]
        rules += bn(f"stage{s}.0.net.1.bn",
                    f"{scope}/MaskedBatchNorm_{bn_top}"); bn_top += 1
        rules += residual(f"stage{s}.1", rb, cin != cout); rb += 1
        rules += residual(f"stage{s}.2", rb, False); rb += 1

    # decoder stages (mink.py:58-96): up conv + 2 residuals (concat input)
    up_ch = [(CS[4], CS[5], CS[3]), (CS[5], CS[6], CS[2]),
             (CS[6], CS[7], CS[1]), (CS[7], CS[8], CS[0])]
    for u, (cin, cout, skip) in enumerate(up_ch, start=1):
        rules += [(f"up{u}.0.net.0", f"{scope}/UpConv_{u-1}", "convT2")]
        rules += bn(f"up{u}.0.net.1.bn",
                    f"{scope}/MaskedBatchNorm_{bn_top}"); bn_top += 1
        rules += residual(f"up{u}.1.0", rb, True); rb += 1   # cout+skip != cout
        rules += residual(f"up{u}.1.1", rb, False); rb += 1

    if include_heads:
        # per-level point BatchNorms (mink.py:100-101)
        for i in range(4):
            rules += bn(f"out_bnorm.{i}",
                        f"{scope}/MaskedBatchNorm_{bn_top}"); bn_top += 1
        # semantic head (mink.py:98)
        rules += [("sem_head", f"{scope}/Dense_0", "linear")]
    return rules


def _rules_decoder(num_layers=9, feature_levels=3, hidden=256):
    rules = [("query_feat.weight", "decoder/query_feat", "raw"),
             ("query_embed.weight", "decoder/query_embed", "raw"),
             ("mask_feat_proj", "decoder/mask_feat_proj", "linear")]
    # input projections for channels != hidden (decoder.py:55-61): levels
    # are [256, 128, 96] -> linear for indices 1, 2
    in_ch = [CS[4], CS[6], CS[7]][:feature_levels]
    for i, ch in enumerate(in_ch):
        if ch != hidden:
            rules += [(f"input_proj.{i}", f"decoder/input_proj_{i}", "linear")]
    for i in range(num_layers):
        ca = f"transformer_cross_attention_layers.{i}"
        rules += [(f"{ca}.multihead_attn",
                   f"decoder/CrossAttentionLayer_{i}/MultiheadAttention_0",
                   "mha"),
                  (f"{ca}.norm", f"decoder/CrossAttentionLayer_{i}/LayerNorm_0",
                   "ln")]
        sa = f"transformer_self_attention_layers.{i}"
        rules += [(f"{sa}.self_attn",
                   f"decoder/SelfAttentionLayer_{i}/MultiheadAttention_0",
                   "mha"),
                  (f"{sa}.norm", f"decoder/SelfAttentionLayer_{i}/LayerNorm_0",
                   "ln")]
        ff = f"transformer_ffn_layers.{i}"
        rules += [(f"{ff}.linear1", f"decoder/FFNLayer_{i}/Dense_0", "linear"),
                  (f"{ff}.linear2", f"decoder/FFNLayer_{i}/Dense_1", "linear"),
                  (f"{ff}.norm", f"decoder/FFNLayer_{i}/LayerNorm_0", "ln")]
    rules += [("decoder_norm", "decoder/decoder_norm", "ln"),
              ("class_embed", "decoder/class_embed", "linear"),
              ("mask_embed.layers.0", "decoder/mask_embed/Dense_0", "linear"),
              ("mask_embed.layers.1", "decoder/mask_embed/Dense_1", "linear"),
              ("mask_embed.layers.2", "decoder/mask_embed/Dense_2", "linear")]
    return rules


def expected_torch_keys(prefix_backbone="backbone.", prefix_decoder="decoder."):
    """Every torch state-dict key the converter consumes (for validation)."""
    keys = []
    for base, _, kind in _rules_backbone():
        keys += _keys_for(prefix_backbone + base, kind)
    for base, _, kind in _rules_decoder():
        keys += _keys_for(prefix_decoder + base, kind)
    return keys


def _keys_for(base, kind):
    if kind in ("conv3", "conv2", "convT2", "conv1"):
        return [f"{base}.kernel"]
    if kind == "bn":
        return [f"{base}.weight", f"{base}.bias", f"{base}.running_mean",
                f"{base}.running_var"]
    if kind == "linear":
        return [f"{base}.weight", f"{base}.bias"]
    if kind == "ln":
        return [f"{base}.weight", f"{base}.bias"]
    if kind == "mha":
        return [f"{base}.in_proj_weight", f"{base}.in_proj_bias",
                f"{base}.out_proj.weight", f"{base}.out_proj.bias"]
    if kind == "raw":
        return [base]
    raise ValueError(kind)


def _convert(state: dict, template_variables, rule_groups):
    """Fill `template_variables` (from model.init) with torch weights.

    rule_groups: list of (prefix, rules) pairs.
    Raises KeyError/ValueError with the offending name on any mismatch."""
    import flax

    params = dict(flax.traverse_util.flatten_dict(
        template_variables["params"], sep="/"))
    stats = dict(flax.traverse_util.flatten_dict(
        template_variables.get("batch_stats", {}), sep="/"))

    def get(name):
        if name not in state:
            raise KeyError(f"torch checkpoint missing {name}")
        return np.asarray(state[name])

    def put(tree, path, value):
        if path not in tree:
            raise KeyError(f"no flax parameter {path}")
        if tree[path].shape != value.shape:
            raise ValueError(f"{path}: shape {tree[path].shape} != "
                             f"{value.shape}")
        tree[path] = value.astype(np.float32)

    def apply(base, flax_scope, kind):
        if kind == "conv3":
            put(params, f"{flax_scope}/kernel", _conv(get(base + ".kernel"),
                                                      _PERM_K3))
        elif kind in ("conv2", "convT2"):
            put(params, f"{flax_scope}/kernel", _conv(get(base + ".kernel"),
                                                      _PERM_K2))
        elif kind == "conv1":
            put(params, f"{flax_scope}/kernel", get(base + ".kernel"))
        elif kind == "bn":
            put(params, f"{flax_scope}/scale", get(base + ".weight"))
            put(params, f"{flax_scope}/bias", get(base + ".bias"))
            put(stats, f"{flax_scope}/mean", get(base + ".running_mean"))
            put(stats, f"{flax_scope}/var", get(base + ".running_var"))
        elif kind == "linear":
            put(params, f"{flax_scope}/kernel", get(base + ".weight").T)
            put(params, f"{flax_scope}/bias", get(base + ".bias"))
        elif kind == "ln":
            put(params, f"{flax_scope}/scale", get(base + ".weight"))
            put(params, f"{flax_scope}/bias", get(base + ".bias"))
        elif kind == "mha":
            w = get(base + ".in_proj_weight")
            b = get(base + ".in_proj_bias")
            d = w.shape[1]
            for i, name in enumerate(("q", "k", "v")):
                put(params, f"{flax_scope}/{name}/kernel",
                    w[i * d:(i + 1) * d].T)
                put(params, f"{flax_scope}/{name}/bias", b[i * d:(i + 1) * d])
            put(params, f"{flax_scope}/out/kernel",
                get(base + ".out_proj.weight").T)
            put(params, f"{flax_scope}/out/bias", get(base + ".out_proj.bias"))
        elif kind == "raw":
            put(params, flax_scope, get(base))
        else:
            raise ValueError(kind)

    for prefix, rules in rule_groups:
        for base, scope, kind in rules:
            apply(prefix + base, scope, kind)

    import jax.numpy as jnp
    out = {"params": flax.traverse_util.unflatten_dict(
        {tuple(k.split("/")): jnp.asarray(v) for k, v in params.items()})}
    if stats:
        out["batch_stats"] = flax.traverse_util.unflatten_dict(
            {tuple(k.split("/")): jnp.asarray(v) for k, v in stats.items()})
    return out


def convert_state_dict(state: dict, template_variables,
                       prefix_backbone="backbone.",
                       prefix_decoder="decoder."):
    """MaskPLS checkpoint (MinkEncoderDecoder + MaskedTransformerDecoder)."""
    return _convert(state, template_variables,
                    [(prefix_backbone, _rules_backbone()),
                     (prefix_decoder, _rules_decoder())])


def _rules_tarl():
    """TARL MinkUNet rules: backbone layout sans heads, paths rooted at the
    module itself (MinkUNet.init puts children at the tree top level)."""
    return [(b, s[len("backbone/"):], k)
            for b, s, k in _rules_backbone(include_heads=False)]


def convert_tarl_state_dict(state: dict, template_variables, prefix=""):
    """TARL MinkUNet checkpoint (tarl.pt `checkpoint["model"]`,
    Pointcloud-Models/tarl/tarl_extractor.py:37-38) onto a
    MinkUNet(voxel_output=True, updown_act="relu") template."""
    return _convert(state, template_variables, [(prefix, _rules_tarl())])


def expected_tarl_keys(prefix=""):
    keys = []
    for base, _, kind in _rules_tarl():
        keys += _keys_for(prefix + base, kind)
    return keys
