"""Compiled peak-memory accounting for the flagship steps.

Round 4 shipped a silent HBM-margin erosion: two rounds of (individually
correct) changes grew the b32 Mixed train step from fitting to 15.79 G of
15.75 G — discovered only when the real chip refused to compile
(PERF.md round-4). This module makes compiled memory a MEASURED quantity:

  * `compiled_memory(kind, batch)` lowers the flagship serving or Mixed
    train step with abstract (ShapeDtypeStruct) arguments — no batch data,
    no execution — compiles it for the current backend, and returns
    `compiled.memory_analysis()` totals;
  * `python -m spatialalignmentnetwork_tpu.utils.membudget --kind train
    --batch 32` prints one JSON line, runnable against CPU (the CI guard,
    tests/test_memory_budget.py) or the real TPU (the number that OOMs);
  * the guard test pins explicit byte budgets so the next erosion fails
    in CI instead of on-chip.

The flagship shapes match bench.py and
tests/test_parallel.py::test_dp_flagship_shape_mixed_step (reference
widths, `/root/reference/model.py:58-71`).
"""

import argparse
import json
import sys
import time


def flagship_cfg(reg="Mixed"):
    """The canonical flagship Config: 320x320 single-coil, all five nets
    at reference widths (csmodel defaults), reference loss weights
    (commands_train_test.sh:26-28)."""
    from ..engine.config import Config

    cfg = Config()
    cfg.sparsity = 0.25
    cfg.lr = 1e-4
    cfg.shape = 320
    cfg.coils = 1
    cfg.reg = reg
    cfg.mask = "equispaced"
    cfg.weight_smooth = 1000.0
    cfg.weight_gan = 0.1
    cfg.weight_gan_sim = 1.0
    cfg.weight_sim = 1.0
    # bf16, like the production train/serving steps (bench.py --dtype
    # default): the round-4 on-chip OOM was the bf16 b32 step, so the
    # guard must compile the same dtype path — which since round 5 also
    # selects the s2d train layout (csmodel.build s2d_train auto).
    cfg.use_amp = True
    return cfg


def compiled_memory(kind, batch, reg="Mixed"):
    """Compile the flagship `kind` step ('serving' | 'train') at `batch`
    for the CURRENT backend from abstract inputs and return its
    memory_analysis as a dict (bytes), plus lower/compile wall times.

    Abstract lowering: parameters are initialized (their VALUES seed the
    spectral-norm u/v shapes etc.) but the batch never exists — only its
    ShapeDtypeStruct — so this runs in minutes on a 16 GB host even for
    configs whose EXECUTION would need 10x that.
    """
    import jax
    import jax.numpy as jnp

    from ..engine.csmodel import CSModel

    net = CSModel(cfg=flagship_cfg(reg if kind == "train" else "Rec"))

    abs_of = lambda t: jax.tree_util.tree_map(
        lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), t
    )
    state_abs = abs_of(net.state)
    img = jax.ShapeDtypeStruct(
        (batch, net.cfg.coils, net.cfg.shape, net.cfg.shape), jnp.complex64
    )

    t0 = time.time()
    if kind == "serving":
        net.eval()
        lowered = jax.jit(net.recon_step).lower(state_abs, img, img)
    elif kind == "train":
        fn = net._make_train_step(reg, (batch, net.cfg.coils,
                                        net.cfg.shape, net.cfg.shape))
        lowered = fn.lower(state_abs, img, img, abs_of(net._rng))
    else:
        raise ValueError(f"kind must be 'serving' or 'train', got {kind!r}")
    t_lower = time.time() - t0

    t0 = time.time()
    compiled = lowered.compile()
    t_compile = time.time() - t0

    ma = compiled.memory_analysis()
    if ma is None:
        raise RuntimeError("backend returned no memory_analysis")

    def _get(name):
        v = getattr(ma, name, None)
        return int(v) if v is not None else None

    return {
        "kind": kind,
        "reg": reg if kind == "train" else None,
        "batch": batch,
        "backend": jax.default_backend(),
        "temp_bytes": _get("temp_size_in_bytes"),
        "argument_bytes": _get("argument_size_in_bytes"),
        "output_bytes": _get("output_size_in_bytes"),
        "generated_code_bytes": _get("generated_code_size_in_bytes"),
        "lower_s": round(t_lower, 1),
        "compile_s": round(t_compile, 1),
    }


def main(argv=None):
    p = argparse.ArgumentParser(description=__doc__.splitlines()[0])
    p.add_argument("--kind", choices=["serving", "train"], required=True)
    p.add_argument("--batch", type=int, required=True)
    p.add_argument("--reg", type=str, default="Mixed")
    p.add_argument("--platform", type=str, default=None,
                   help="force a jax platform (cpu for the CI reference, "
                        "default = the session backend, e.g. the TPU)")
    args = p.parse_args(argv)
    if args.platform:
        import jax

        jax.config.update("jax_platforms", args.platform)
    out = compiled_memory(args.kind, args.batch, args.reg)
    print(json.dumps(out))
    return out


if __name__ == "__main__":
    sys.exit(0 if main() else 1)
