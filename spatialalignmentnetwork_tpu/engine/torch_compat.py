"""Cross-loading of reference (PyTorch) checkpoints.

The reference persists each network as an npz of torch state_dict arrays
(basemodel.py:43-55). This module converts those state dicts into this
framework's flax parameter/stat trees so reference-trained weights can be
evaluated or fine-tuned here (and parity can be checked numerically).

Weight layout conversions (verified numerically vs torch):
  * Conv2d weight [out, in, kh, kw]       -> kernel [kh, kw, in, out]
  * ConvTranspose2d weight [in, out, kh, kw] -> spatially FLIPPED then
    [kh, kw, in, out] (torch's transposed conv correlates with the flipped
    kernel relative to lax.conv_transpose)
  * BatchNorm: weight/bias -> scale/bias params; running_mean/var ->
    mean/var stats
  * spectral_norm conv: weight_orig -> kernel; weight_u/weight_v -> the
    u/v power-iteration state of models.gan.SpectralConv (which implements
    torch-exact semantics, so eval outputs match bit-for-bit)

Structural mapping:
  * fastMRI Unet / NormUnet / VarNet: explicit key mapping (ModuleList
    definition order differs from execution order there).
  * LibUNet / SpatialTransformer / NetG / NetD: ordered zip — for these
    pure-sequential recursive modules, torch state_dict order equals
    execution order equals this framework's call-order module numbering.

Entry point: convert_reference_checkpoint(ref_ckpt_dir, out_dir).
"""

import os

import numpy as np

from .config import Config


def _conv_w(w):
    return np.transpose(w, (2, 3, 1, 0))


def _convT_w(w):
    return np.ascontiguousarray(np.transpose(w[:, :, ::-1, ::-1], (2, 3, 0, 1)))


# --------------------------------------------------------------- stem groups
def group_state_dict(sd):
    """Group a flat state_dict by module stem, preserving first-appearance
    order. Returns a list of (stem, {leaf_name: array}) entries."""
    order = []
    groups = {}
    for key, val in sd.items():
        stem, leaf = key.rsplit(".", 1)
        if stem not in groups:
            groups[stem] = {}
            order.append(stem)
        groups[stem][leaf] = np.asarray(val)
    return [(stem, groups[stem]) for stem in order]


def classify(group):
    leaves = set(group.keys())
    if "running_mean" in leaves:
        return "bn"
    if "weight_orig" in leaves:
        return "snconv"
    if "weight" in leaves and group["weight"].ndim == 4:
        return "conv"
    return "other"


# ------------------------------------------------- LibUNet-family (ordered)
def libunet_family_to_flax(sd, conv_slot_names, bn_slot_names):
    """Ordered-zip conversion for the BN+LeakyReLU recursive family.

    conv_slot_names / bn_slot_names: joined flax paths in call order, e.g.
    ['LibUNet_0/Conv_0', ..., 'Conv_0']. Returns (params_flat, stats_flat).
    """
    params, stats = {}, {}
    ci = bi = 0
    for stem, group in group_state_dict(sd):
        kind = classify(group)
        if kind == "conv":
            slot = conv_slot_names[ci]
            ci += 1
            params[f"{slot}/kernel"] = _conv_w(group["weight"])
            if "bias" in group:
                params[f"{slot}/bias"] = group["bias"]
        elif kind == "bn":
            slot = bn_slot_names[bi]
            bi += 1
            params[f"{slot}/scale"] = group["weight"]
            params[f"{slot}/bias"] = group["bias"]
            stats[f"{slot}/mean"] = group["running_mean"]
            stats[f"{slot}/var"] = group["running_var"]
        elif kind == "snconv":
            raise ValueError(f"unexpected spectral conv at {stem}")
    assert ci == len(conv_slot_names), (ci, len(conv_slot_names))
    assert bi == len(bn_slot_names), (bi, len(bn_slot_names))
    return params, stats


def snconv_family_to_flax(sd, slot_names):
    """Ordered-zip conversion for NetG/NetD (SNConv blocks).

    slot_names: flax 'SNConv_k' paths in call order. Each torch Conv block
    contributes an optional BN group then a spectral-norm conv group.
    """
    params, stats = {}, {}
    si_bn = si_conv = 0
    for stem, group in group_state_dict(sd):
        kind = classify(group)
        if kind == "bn":
            slot = slot_names[si_bn]
            si_bn += 1
            params[f"{slot}/BatchNorm_0/scale"] = group["weight"]
            params[f"{slot}/BatchNorm_0/bias"] = group["bias"]
            stats[f"{slot}/BatchNorm_0/mean"] = group["running_mean"]
            stats[f"{slot}/BatchNorm_0/var"] = group["running_var"]
        elif kind == "snconv":
            slot = slot_names[si_conv]
            si_conv += 1
            w = group["weight_orig"]
            params[f"{slot}/SpectralConv_0/kernel"] = _conv_w(w)
            if "bias" in group:
                params[f"{slot}/SpectralConv_0/bias"] = group["bias"]
            # torch-layout u [out] and v [in*kh*kw] cross-load directly
            stats[f"{slot}/SpectralConv_0/u"] = group["weight_u"]
            stats[f"{slot}/SpectralConv_0/v"] = group["weight_v"]
        elif kind == "conv":
            raise ValueError(f"unexpected plain conv at {stem}")
    assert si_conv == len(slot_names), (si_conv, len(slot_names))
    return params, stats


# --------------------------------------------------------- fastMRI Unet map
def fastmri_unet_to_flax(sd, prefix, num_pools):
    """Explicit mapping for the fastMRI Unet (varnet.py:24-119 layout)."""
    params = {}

    def convblock(torch_prefix, flax_prefix):
        params[f"{flax_prefix}/Conv_0/kernel"] = _conv_w(
            sd[f"{torch_prefix}layers.0.weight"]
        )
        params[f"{flax_prefix}/Conv_1/kernel"] = _conv_w(
            sd[f"{torch_prefix}layers.3.weight"]
        )

    for i in range(num_pools):
        convblock(f"{prefix}down_sample_layers.{i}.", f"ConvBlock_{i}")
    convblock(f"{prefix}conv.", f"ConvBlock_{num_pools}")
    for i in range(num_pools):
        params[f"TransposeConvBlock_{i}/ConvTranspose_0/kernel"] = _convT_w(
            sd[f"{prefix}up_transpose_conv.{i}.layers.0.weight"]
        )
        if i < num_pools - 1:
            convblock(f"{prefix}up_conv.{i}.", f"ConvBlock_{num_pools + 1 + i}")
    convblock(f"{prefix}up_conv.{num_pools - 1}.0.", f"ConvBlock_{2 * num_pools}")
    params["Conv_0/kernel"] = _conv_w(
        sd[f"{prefix}up_conv.{num_pools - 1}.1.weight"]
    )
    params["Conv_0/bias"] = sd[f"{prefix}up_conv.{num_pools - 1}.1.bias"]
    return params


def varnet_to_flax(sd, num_cascades=8, sens_pools=4, pools=4):
    """Reference VarNet state_dict -> flat flax params for models.VarNet."""
    sd = {k: np.asarray(v) for k, v in sd.items()}
    params = {}
    sens = fastmri_unet_to_flax(sd, "sens_net.norm_unet.unet.", sens_pools)
    for k, v in sens.items():
        params[f"SensitivityModel_0/NormUnet_0/Unet_0/{k}"] = v
    # cascades: stack per-cascade trees along a leading scan axis
    per_cascade = [
        fastmri_unet_to_flax(sd, f"cascades.{c}.model.unet.", pools)
        for c in range(num_cascades)
    ]
    for k in per_cascade[0]:
        params[f"VarNetBlock_0/NormUnet_0/Unet_0/{k}"] = np.stack(
            [pc[k] for pc in per_cascade], axis=0
        )
    params["VarNetBlock_0/dc_weight"] = np.stack(
        [np.asarray(sd[f"cascades.{c}.dc_weight"]) for c in range(num_cascades)],
        axis=0,
    )
    return params


# ------------------------------------------------------------- slot builders
def _libunet_slots(flat_param_keys, unet_prefix="LibUNet_0"):
    """Derive ordered conv/bn slot lists for a LibUNet tree + optional
    trailing head conv at the parent level."""
    convs = sorted(
        {k.rsplit("/", 1)[0] for k in flat_param_keys
         if f"{unet_prefix}/Conv_" in k},
        key=lambda s: int(s.rsplit("_", 1)[1]),
    )
    bns = sorted(
        {k.rsplit("/", 1)[0] for k in flat_param_keys
         if f"{unet_prefix}/BatchNorm_" in k},
        key=lambda s: int(s.rsplit("_", 1)[1]),
    )
    return convs, bns


def stn_to_flax(sd, flat_param_keys):
    """Reference SpatialTransformer state_dict -> (params, stats) flat."""
    convs, bns = _libunet_slots(flat_param_keys)
    # execution order: all LibUNet convs, then the zero-init head conv
    conv_slots = convs + ["Conv_0"]
    return libunet_family_to_flax(sd, conv_slots, bns)


def netg_to_flax(sd, flat_param_keys):
    slots = sorted(
        {k.split("/", 1)[0] for k in flat_param_keys if k.startswith("SNConv_")},
        key=lambda s: int(s.rsplit("_", 1)[1]),
    )
    return snconv_family_to_flax(sd, slots)


netd_to_flax = netg_to_flax


def mask_to_flax(sd):
    params, extra = {}, {}
    if "weight" in sd:
        params["weight"] = np.asarray(sd["weight"])
    if "pruned" in sd:
        extra["pruned"] = np.asarray(sd["pruned"]).astype(bool)
    return params, extra


# ------------------------------------------------------------ whole ckpt
def load_torch_state_dict(path):
    """Read a reference network file: npz of numpy arrays (the reference's
    native save format) or a torch-serialized file when torch is present."""
    try:
        with np.load(path, allow_pickle=False) as z:
            return {k: z[k] for k in z.files}
    except Exception:
        import torch

        # weights_only=True: this tool ingests externally-produced
        # checkpoint files; an unrestricted unpickle would execute
        # arbitrary code from a crafted file. Legacy reference files are
        # plain tensor state dicts, which weights_only handles.
        sd = torch.load(path, map_location="cpu", weights_only=True)
        return {k: v.detach().cpu().numpy() for k, v in sd.items()}


def is_reference_entry(flat: dict) -> bool:
    """Does this per-net flat mapping look like a raw reference torch
    state_dict (torch key names) rather than a native checkpoint entry
    ('params/...', 'stats/...', 'pruned')? A bare {'pruned'} entry is
    treated as native — both interpretations agree for it."""
    return any(
        not (k.startswith("params/") or k.startswith("stats/")
             or k == "pruned")
        for k in flat.keys()
    )


def convert_net_state(name, sd, cfg, tmpl_params):
    """In-memory conversion of ONE reference torch state_dict into this
    framework's flat checkpoint entry ({'params/...': arr, ...}).

    tmpl_params: the freshly-built params tree for this net (its key
    structure drives slot ordering for the ordered-zip families).
    Returns None for names this converter doesn't know.
    """
    from .checkpoint import flatten_tree

    sd = {k: np.asarray(v) for k, v in sd.items()}
    tmpl_p = flatten_tree(tmpl_params)
    if name == "net_R":
        p = varnet_to_flax(
            sd,
            num_cascades=cfg.get("net_R_cascades", 8),
            sens_pools=cfg.get("net_R_sens_pools", 4),
            pools=cfg.get("net_R_pools", 4),
        )
        s, extra = {}, {}
    elif name == "net_T":
        p, s = stn_to_flax(sd, tmpl_p.keys())
        extra = {}
    elif name == "net_G":
        p, s = netg_to_flax(sd, tmpl_p.keys())
        extra = {}
    elif name == "net_D":
        p, s = netd_to_flax(sd, tmpl_p.keys())
        extra = {}
    elif name == "net_mask":
        p, extra = mask_to_flax(sd)
        # fixed masks carry an (all-ones) weight param in reference
        # checkpoints but have no learnable weight here — drop it
        if "weight" not in tmpl_p:
            p.pop("weight", None)
        s = {}
    else:
        return None
    entry = {f"params/{k}": v for k, v in p.items()}
    entry.update({f"stats/{k}": v for k, v in s.items()})
    entry.update(extra)
    return entry


def convert_reference_checkpoint(ref_dir, out_dir, seed=0):
    """Convert a reference checkpoint DIRECTORY into this framework's
    checkpoint format (loadable by CSModel(ckpt=out_dir))."""
    from .csmodel import CSModel
    from .checkpoint import ckpt_save

    cfg = Config().load(os.path.join(ref_dir, "config"))
    net = CSModel(cfg=cfg, seed=seed)

    ckpt = {}
    for name in os.listdir(ref_dir):
        path = os.path.join(ref_dir, name)
        if name == "config":
            continue
        sd = load_torch_state_dict(path)
        entry = convert_net_state(
            name, sd, cfg, net.state["params"].get(name, {})
        )
        if entry is not None:
            ckpt[name] = entry
    ckpt["config"] = cfg
    ckpt_save(ckpt, out_dir)
    return out_dir


if __name__ == "__main__":
    import sys

    convert_reference_checkpoint(sys.argv[1], sys.argv[2])
