"""Directory-per-checkpoint persistence.

Format-compatible with the reference layout (basemodel.py:43-55): a
checkpoint is a DIRECTORY containing one flat npz file per network (named
after the network, e.g. `net_R`) plus a JSON `config`. This enables
object-level deduplication between checkpoints and the staged training
protocol's partial warm-starting (`--load_nets`).

Network entries are flat dicts mapping '/'-joined pytree paths to numpy
arrays; `flatten_tree`/`unflatten_tree` convert to/from nested param trees.
Optimizer state is deliberately NOT checkpointed (parity with the reference,
basemodel.py:149-152): resume restarts optimizer moments.
"""

import os

import numpy as np

from .config import Config


def flatten_tree(tree, prefix="") -> dict:
    """Nested dict pytree -> {'a/b/c': np.ndarray}."""
    out = {}
    if isinstance(tree, dict):
        for k, v in tree.items():
            out.update(flatten_tree(v, f"{prefix}{k}/"))
    else:
        out[prefix[:-1]] = np.asarray(tree)
    return out


def unflatten_tree(flat: dict) -> dict:
    out = {}
    for key, val in flat.items():
        parts = key.split("/")
        d = out
        for p in parts[:-1]:
            d = d.setdefault(p, {})
        d[parts[-1]] = val
    return out


def ckpt_save(ckpt: dict, folder: str):
    """ckpt: {'net_X': nested tree or flat dict, ..., 'config': Config}.

    An existing checkpoint DIRECTORY is overwritten (resume re-passes
    earlier periodic-checkpoint names; the reference's torch.save also
    overwrites silently). A same-named non-directory is refused.

    Crash-safe: the new checkpoint is fully written to a sibling temp
    directory first, then swapped in. Deleting the old one BEFORE writing
    (the previous behavior) destroys the only best.pt on a mid-save
    disk-full/SIGKILL and leaves a partial dir that mtime-based resume
    would pick up. The old directory is renamed aside (not rmtree'd)
    before the swap, so a crash at any point leaves at least one COMPLETE
    checkpoint under the target name or its `.old-save` sibling; the slow
    rmtree of the stale copy happens only after the new one is in place.
    """
    assert isinstance(ckpt, dict)
    import shutil

    if os.path.exists(folder):
        assert os.path.isdir(folder), folder + " exists and is not a directory"
    tmp = folder.rstrip("/\\") + ".tmp-save"
    old = folder.rstrip("/\\") + ".old-save"
    if os.path.exists(tmp):
        shutil.rmtree(tmp)
    os.makedirs(tmp)
    for key, val in ckpt.items():
        path = os.path.join(tmp, key)
        if key == "config":
            val.save(path)
        else:
            flat = val if _is_flat(val) else flatten_tree(val)
            with open(path, "wb") as f:
                np.savez(f, **{k: np.asarray(v) for k, v in flat.items()})
    if os.path.exists(folder):
        if os.path.exists(old):
            shutil.rmtree(old)
        os.replace(folder, old)
        os.replace(tmp, folder)
        shutil.rmtree(old)
    else:
        os.replace(tmp, folder)


def _is_flat(d):
    return isinstance(d, dict) and all(
        not isinstance(v, dict) for v in d.values()
    )


def ckpt_load(folder: str) -> dict:
    """Load a checkpoint -> {'net_X': flat dict, 'config': Config}.

    Accepts every layout the reference's loader does (basemodel.py:17-41):
      * native directory of npz entries + JSON config;
      * a directory whose entries are torch-serialized state dicts
        (legacy reference saves);
      * a single torch-serialized FILE holding the whole
        {'net_X': state_dict, 'config': ...} dict.
    Torch-format network entries come back as raw state-dict mappings
    (torch key names); CSModel.load detects that shape and routes them
    through torch_compat conversion automatically.
    """
    if not os.path.exists(folder) and os.path.isdir(folder + ".repack"):
        # Finish an interrupted single-file re-pack (the __main__ CLI
        # removes the legacy file before renaming the fresh directory over
        # its name; a crash in that window leaves only NAME.repack).
        os.replace(folder + ".repack", folder)
    if os.path.isfile(folder):
        return _load_torch_ckpt_file(folder)
    ckpt = {}
    for key in os.listdir(folder):
        path = os.path.join(folder, key)
        if key == "config":
            ckpt[key] = Config().load(path)
        else:
            try:
                with np.load(path, allow_pickle=False) as z:
                    ckpt[key] = {k: z[k] for k in z.files}
            except Exception:
                from .torch_compat import load_torch_state_dict

                ckpt[key] = load_torch_state_dict(path)
    return ckpt


def _load_torch_ckpt_file(path: str) -> dict:
    """Legacy single-file torch checkpoint (reference basemodel.py:18-19).

    weights_only=True: refuses arbitrary pickled code from externally
    produced files. The config entry is accepted as a plain dict (Config
    objects don't survive weights_only; legacy files carrying one need the
    offline `python -m ...engine.checkpoint` re-pack under torch).
    """
    import torch

    raw = torch.load(path, map_location="cpu", weights_only=True)
    ckpt = {}
    for key, val in raw.items():
        if key == "config":
            cfg = Config()
            for k, v in dict(val).items():
                setattr(cfg, k, v)
            ckpt[key] = cfg
        else:
            ckpt[key] = {
                k: (v.detach().cpu().numpy() if hasattr(v, "detach") else
                    np.asarray(v))
                for k, v in val.items()
            }
    return ckpt


if __name__ == "__main__":
    # checkpoint round-trip / re-pack CLI (reference basemodel.py:184-197):
    #   python -m ...engine.checkpoint CKPT [OUT]
    # with OUT: load CKPT and save a fresh copy at OUT; without: rewrite
    # CKPT in place (normalizes any loadable layout to the native one).
    import sys

    src = sys.argv[1]
    ckpt = ckpt_load(src)
    if len(sys.argv) >= 3:
        ckpt_save(ckpt, sys.argv[2])
    elif os.path.isdir(src):
        # ckpt_save overwrites directories atomically (tmp + .old-save
        # swap) — deleting first would re-open the data-loss window its
        # docstring hardens against
        ckpt_save(ckpt, src)
    else:
        # legacy single-FILE torch checkpoint: write the native directory
        # layout beside it first, remove the file only after success
        ckpt_save(ckpt, src + ".repack")
        os.remove(src)
        os.replace(src + ".repack", src)
