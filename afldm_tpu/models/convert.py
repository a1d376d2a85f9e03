"""PyTorch/diffusers checkpoint <-> Flax parameter conversion.

The published reference checkpoints (`SingleZombie/alias_free_ldm_ffhq`
etc.) are diffusers state dicts; this maps them onto our param trees so the
0.1 dB parity target (BASELINE.md) can be checked against real weights.

Matching is structural: both the torch key and the flax path are collapsed
to a canonical token string (separators and case removed), so the two
naming schemes (diffusers ``down_blocks.0.resnets.1`` vs flax
``down_blocks_0/resnets_1`` or the VAE's flattened
``down_blocks_0_resnets_0``) line up without per-model tables.

Weight layout rules:
- conv (torch OIHW) -> flax HWIO,
- linear (torch [out, in]) -> flax [in, out],
- norm weight/bias -> scale/bias.
"""

import re
from typing import Dict

import numpy as np


def _canon(s: str) -> str:
    return re.sub(r"[._/\-]", "", s.lower())


def _flatten(tree, prefix=()):
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(_flatten(v, prefix + (k,)))
    else:
        out[prefix] = tree
    return out


def torch_to_flax(state_dict: Dict[str, np.ndarray], flax_params):
    """Returns (new_params, report). ``state_dict`` maps diffusers keys to
    numpy arrays (load .safetensors/.bin externally). Unmatched torch keys
    and unfilled flax leaves are reported, not fatal."""
    inner = flax_params["params"] if "params" in flax_params else flax_params
    flat = _flatten(inner)

    # canonical parent-path -> {leafname: treepath}
    nodes = {}
    for path in flat:
        parent = _canon("".join(path[:-1]))
        nodes.setdefault(parent, {})[path[-1]] = path

    new_flat = dict(flat)
    unmatched, filled = [], set()
    for tkey, val in state_dict.items():
        val = np.asarray(val)
        parts = tkey.split(".")
        leaf = parts[-1]
        parent = _canon("".join(parts[:-1]))
        node = nodes.get(parent)
        if (node is None and leaf == "weight" and len(parts) >= 2
                and parts[-2] == "embedding"):
            # torch nn.Embedding ("...embedding.weight") maps to a flax
            # leaf named "embedding" one level up (e.g. the VQ codebook)
            node = nodes.get(_canon("".join(parts[:-2])))
            leaf = "embedding"
        if node is None:
            unmatched.append(tkey)
            continue
        if leaf == "weight":
            target_leaf = ("kernel" if "kernel" in node
                           else "scale" if "scale" in node
                           else "embedding" if "embedding" in node
                           else None)
        elif leaf == "bias":
            target_leaf = "bias" if "bias" in node else None
        else:
            target_leaf = leaf if leaf in node else None
        if target_leaf is None:
            unmatched.append(tkey)
            continue
        path = node[target_leaf]
        target = flat[path]
        if val.ndim == 4 and target.ndim == 4:
            val = val.transpose(2, 3, 1, 0)  # OIHW -> HWIO
        elif (val.ndim == 2 and target.ndim == 2
              and target_leaf != "embedding"):  # codebooks aren't transposed
            val = val.T
        if val.shape != target.shape:
            unmatched.append(f"{tkey} (shape {val.shape} vs {target.shape})")
            continue
        new_flat[path] = val.astype(np.asarray(target).dtype)
        filled.add(path)

    missing = [
        "/".join(p) for p in flat if p not in filled
    ]
    new_inner = _unflatten(new_flat)
    new_params = (dict(flax_params) | {"params": new_inner}
                  if "params" in flax_params else new_inner)
    report = {"unmatched_torch_keys": unmatched,
              "unfilled_flax_leaves": missing,
              "n_converted": len(filled)}
    return new_params, report


def flax_to_torch(flax_params) -> Dict[str, np.ndarray]:
    """Export our params as a diffusers-style state dict (UNet naming;
    the inverse of torch_to_flax for round-trip tests and interop)."""
    inner = flax_params["params"] if "params" in flax_params else flax_params
    flat = _flatten(inner)
    containers = ("down_blocks|up_blocks|resnets|attentions|downsamplers"
                  "|upsamplers|to_out|transformer_blocks|norms|nets|net"
                  "|controlnet_down_blocks|conv"
                  # gmflow containers (backbone.layerK.J handled by the
                  # digit-chain rule; these are the named ones)
                  "|layers|downsample|upsampler|mlp")
    out = {}
    for path, val in flat.items():
        val = np.asarray(val)
        parts = []
        for p in path[:-1]:
            # down_blocks_0 -> down_blocks.0 ; to_out_0 -> to_out.0 ; the
            # VAE's flattened down_blocks_0_resnets_0 expands fully; but
            # literal names like linear_1 / conv1 stay intact
            q = re.sub(r"(\d)_", r"\1.", p)  # split flattened index chains
            q = re.sub(rf"\b({containers})_(\d+)", r"\1.\2", q)
            parts.extend(q.split("."))
        leaf = path[-1]
        if leaf == "kernel":
            name, v = "weight", (val.transpose(3, 2, 0, 1)
                                 if val.ndim == 4 else val.T)
        elif leaf == "scale":
            name, v = "weight", val
        elif leaf == "embedding":  # nn.Embedding codebook: no transpose
            parts.append("embedding")
            name, v = "weight", val
        else:
            name, v = leaf, val
        out[".".join(parts + [name])] = v
    return out


def _unflatten(flat):
    tree = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


def load_torch_state_dict(path) -> Dict[str, np.ndarray]:
    """Load a .safetensors or torch .bin file to numpy."""
    if str(path).endswith(".safetensors"):
        from safetensors.numpy import load_file
        return load_file(path)
    import torch
    sd = torch.load(path, map_location="cpu", weights_only=True)
    return {k: v.numpy() for k, v in sd.items()}
