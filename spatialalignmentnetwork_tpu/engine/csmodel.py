"""CSModel: the 5-network compressed-sensing + alignment orchestrator.

TPU-native re-design of the reference facade (model.py:39-321). Instead of
reflection over mutable attributes, the model state is an explicit pytree

    state = {
      'params': {net_G, net_D, net_T, net_R, net_mask},
      'stats':  {net_G, net_D, net_T},          # BatchNorm/SpectralNorm state
      'opt':    {net_G, net_D, net_T, net_R, net_mask},
      'pruned': bool[W],                         # k-space line mask
    }

and each training regime (`reg` in {None, Rec, Mixed, GAN-Only},
model.py:193-259) is ONE jitted pure function

    state, aux = step(state, img_full, img_aux)

that computes the regime's losses, takes every optimizer step on-device
(including the second GAN discriminator pass on detached fakes,
model.py:234-239), and returns an aux dict whose `loss_*`/`img_*`/`metric_*`
keys drive visualisation — the explicit-output equivalent of the reference's
get_vis attribute harvesting (model.py:292-321).

Semantics preserved from the reference:
  * set_input: k-space undersampling with the pruned mask outside the
    gradient path (model.py:110-121).
  * forwardT/G/R/D composition per regime, including which nets receive
    gradients, the batch-halving synthesis/warp crossover in forwardG
    (model.py:125-136), and the D update on detached fake/real.
  * BatchNorm running stats and spectral-norm power iteration update on
    every training-mode forward, in reference call order.
  * Loss weights sim/smooth/gan/gan_sim from cfg (model.py:140-190).
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax

from ..ops.fft import fft2, ifft2, rss, fftshift2
from ..ops import masks as masks_lib
from ..ops.ssim import ssimloss
from ..models.varnet import VarNet
from ..models.stn import SpatialTransformer, warp, gradient_loss
from ..models.gan import NetG, NetD, loss_gan
from ..utils import metrics_jax as jmetrics
from .checkpoint import ckpt_save, ckpt_load, flatten_tree

_TRUTHY = ("1", "on", "true", "yes")
_FALSY = ("0", "off", "false", "no", "")


def _parse_bool_lever(name, value, auto):
    """Parse an on/off perf-lever value from cfg or env. Accepts bools,
    the usual on/off strings (case-insensitive), and 'auto' -> `auto`;
    anything else is an error rather than python-truthiness (bool('off')
    is True — silently enabling a lever the user asked to disable)."""
    if isinstance(value, bool):
        return value
    s = str(value).strip().lower()
    if s == "auto":
        return auto
    if s in _TRUTHY:
        return True
    if s in _FALSY:
        return False
    raise ValueError(
        f"{name}: expected on/off/auto (or a bool), got {value!r}"
    )


def _parse_level_lever(name, value, auto):
    """Parse an integer-level perf lever (e.g. s2d depth). Accepts ints,
    int strings, on/true (-> 1), off/false (-> 0), and 'auto' -> `auto`."""
    if isinstance(value, bool):
        return int(value)
    if isinstance(value, int):
        return value
    s = str(value).strip().lower()
    if s == "auto":
        return auto
    if s in _TRUTHY:
        return 1
    if s in _FALSY:
        return 0
    try:
        return int(s)
    except ValueError:
        raise ValueError(
            f"{name}: expected an integer level, on/off, or auto; "
            f"got {value!r}"
        ) from None

def _remat_tg(batch, threshold=24):
    """Whether to rematerialize the net_T / net_G training forwards
    (SAN_TPU_REMAT_TG: on/off/auto, default auto).

    net_R's cascade scan is always rematerialized (models/varnet.py:27-47);
    net_T and net_G keep their residuals by default. At batch 32 those
    residuals are what crossed the 15.75 G HBM compile margin at the
    round-4 HEAD (STN's half-lane 64-ch temps + NetG's decoder stack —
    docs/perf_ab_r04.jsonl), so 'auto' turns remat ON once the global
    batch reaches 24, trading one extra T/G forward (~8% of the Mixed
    step's FLOPs, utils/flops.py train_step_flops(remat_tg=True)) for
    fitting. net_G passes threshold=12: it runs on half batches (the
    forwardG synthesis/warp crossover, reference model.py:123-140), so
    its slice of a global batch 24 is 12. Read at trace time; strict
    parsing like the other levers.
    """
    import os

    v = os.environ.get("SAN_TPU_REMAT_TG", "auto")
    return _parse_bool_lever("SAN_TPU_REMAT_TG", v, auto=batch >= threshold)


NET_NAMES = ("net_mask", "net_G", "net_D", "net_T", "net_R")

# which nets receive gradients per training regime (reference
# model.py:193-259: the optimizers stepped in each branch). net_D updates
# in its own second pass; net_mask joins only under live LOUPE learning.
GRAD_NETS = {
    "None": ("net_R",),
    "Rec": ("net_T", "net_R"),
    "Mixed": ("net_T", "net_G", "net_R"),
    "GAN-Only": ("net_T", "net_G"),
}


class CSModel:
    """Facade owning the 5 networks + optimizers + jitted step functions."""

    def __init__(self, cfg=None, ckpt=None, objects=None, seed=0):
        self.seed = seed
        if ckpt is not None:
            self.load(ckpt=ckpt, cfg=cfg, objects=objects)
        else:
            self.build(cfg)
        self.training = True
        self._aux = {}
        self._batch = None
        self._step_cache = {}
        self._rng = jax.random.PRNGKey(seed + 1)

    # ------------------------------------------------------------------ build
    def build(self, cfg):
        assert cfg is not None
        self.cfg = cfg
        coils = cfg.coils
        shape = cfg.shape
        use_amp = bool(cfg.get("use_amp", False))
        self.dtype = jnp.bfloat16 if use_amp else jnp.float32

        # network definitions (architecture config: model.py:53-71);
        # cfg.net_* overrides exist for tests/experiments, defaults are the
        # reference architecture.
        g_layers = tuple(cfg.get("net_G_layers", (64, 128, 256, 512, 512)))
        d_blocks = tuple(
            tuple(b) for b in cfg.get(
                "net_D_blocks",
                ((64,) * 2, (128,) * 2, (256,) * 2, (256,) * 2, (256,) * 2),
            )
        )
        t_layers = tuple(cfg.get("net_T_layers", (32, 64, 64, 64, 64)))
        self.net_G = NetG(out_chans=1, layers=g_layers, dtype=self.dtype)
        self.net_D = NetD(blocks=d_blocks, dtype=self.dtype)
        self.net_T = SpatialTransformer(
            channels=coils, feat=t_layers[0], layers=t_layers, dtype=self.dtype
        )
        # planar-NHWC cascade layout: numerically equivalent (tested to
        # 2e-4) and skips per-cascade complex pack/unpack and NCHW<->NHWC
        # transposes — but MEASURED SLOWER on the v5e (338 vs 369 slices/s
        # serving b128, docs/perf_ab_r03.jsonl: the [N,H,W,2] trailing
        # 2-wide lane dim tiles poorly). auto -> off everywhere; kept as an
        # opt-in for backends where the layout trade may differ.
        import os as _os

        planar = _parse_bool_lever(
            "net_R_planar/SAN_TPU_PLANAR",
            cfg.get("net_R_planar", _os.environ.get("SAN_TPU_PLANAR", "auto")),
            auto=False,
        )
        # space-to-depth execution layout for the k shallowest UNet levels
        # (models/s2d.py): parameter-identical MXU lane-efficiency lever.
        # auto resolves to OFF — measured 24-35% slower at b128 serving on
        # the bandwidth-bound v5e relay (docs/perf_ab_r03.jsonl); opt in
        # on MXU-bound backends via SAN_TPU_S2D / cfg net_R_s2d (a level
        # count; on/true are accepted as 1).
        s2d = _parse_level_lever(
            "net_R_s2d/SAN_TPU_S2D",
            cfg.get("net_R_s2d", _os.environ.get("SAN_TPU_S2D", "auto")),
            auto=0,
        )
        self.net_R = VarNet(
            num_cascades=cfg.get("net_R_cascades", 8),
            sens_chans=cfg.get("net_R_sens_chans", 8),
            sens_pools=cfg.get("net_R_sens_pools", 4),
            chans=cfg.get("net_R_chans", 18),
            pools=cfg.get("net_R_pools", 4),
            use_ref=True,
            planar=planar,
            s2d_levels=s2d,
            # remat defaults ON: without it the backward stores all 8
            # cascades' UNet activations in conv-padded layouts — measured
            # 49.5 GB at batch 8 on a 16 GB v5e (bench --mode train OOM);
            # with it the scan stores only the k-space carries. Forward-only
            # paths (eval/serving) are unaffected by remat.
            remat=bool(cfg.get("net_R_remat", True)),
            dtype=self.dtype,
        )

        # TRAIN-path execution layout for net_R: the same parameter tree
        # applied through an s2d VarNet (apply-equivalent, f64-exact —
        # tests/test_s2d.py). Training at b16 is MXU-bound on the 18-ch
        # 320^2 convs (measured 9.2 TF/s fwd / 5.2 wgrad vs 88-94 TF/s for
        # the 64-ch 160^2 shape, docs/perf_ab_r05 probes), where serving
        # at b128 is bandwidth-bound — so the two paths want OPPOSITE s2d
        # settings. auto -> 1 when use_amp (the bf16 perf path; measured
        # b16 Mixed 1.203 -> 1.471 steps/s, +22%), 0 at f32 (the
        # exactness/parity path keeps the reference op order).
        s2d_train = _parse_level_lever(
            "net_R_s2d_train/SAN_TPU_S2D_TRAIN",
            cfg.get("net_R_s2d_train",
                    _os.environ.get("SAN_TPU_S2D_TRAIN", "auto")),
            auto=(1 if use_amp else 0),
        )
        if s2d_train == s2d:
            self.net_R_train = self.net_R
        else:
            self.net_R_train = VarNet(
                num_cascades=cfg.get("net_R_cascades", 8),
                sens_chans=cfg.get("net_R_sens_chans", 8),
                sens_pools=cfg.get("net_R_sens_pools", 4),
                chans=cfg.get("net_R_chans", 18),
                pools=cfg.get("net_R_pools", 4),
                use_ref=True,
                planar=planar,
                s2d_levels=s2d_train,
                remat=bool(cfg.get("net_R_remat", True)),
                dtype=self.dtype,
            )

        self.mask = masks_lib.make_mask(
            cfg.mask, shape, cfg.get("sparsity"), seed=self.seed
        )

        # parameter/stat initialization with dummy inputs
        k = jax.random.PRNGKey(self.seed)
        kG, kD, kT, kR = jax.random.split(k, 4)
        img = jnp.zeros((2, coils, shape, shape), jnp.float32)
        imgc = img.astype(jnp.complex64)
        rss1 = jnp.zeros((2, 1, shape, shape), jnp.float32)
        # every init is jitted: eager flax init dispatches ops one at a
        # time, and eagerly materializing complex scalar constants (1j)
        # hits the relay backends' missing complex DMA (utils/transfer.py)
        num_low = self.num_low_frequencies
        vG = jax.jit(
            lambda k, x: self.net_G.init({"params": k}, x, train=False)
        )(kG, rss1)
        vD = jax.jit(
            lambda k, x: self.net_D.init({"params": k}, x, train=False)
        )(kD, jnp.concatenate([rss1, rss1], 1))
        vT = jax.jit(
            lambda k, a, b: self.net_T.init({"params": k}, a, b, train=False)
        )(kT, img, img)
        vR = jax.jit(
            lambda k, kc, m, r: self.net_R.init({"params": k}, kc, m, r, num_low)
        )(kR, imgc, jnp.ones(shape, bool), img)

        params = {
            "net_G": vG["params"],
            "net_D": vD["params"],
            "net_T": vT["params"],
            "net_R": vR["params"],
            "net_mask": (
                {"weight": jnp.asarray(self.mask.weight)}
                if self.mask.weight is not None
                else {}
            ),
        }
        stats = {
            "net_G": vG.get("batch_stats", {}),
            "net_D": vD.get("batch_stats", {}),
            "net_T": vT.get("batch_stats", {}),
        }

        # parity guard mirroring the reference's own hard assert
        # (model.py:52 `assert cfg.lr == 1e-4`): the published recipe was
        # only ever validated at this lr, so both frameworks refuse others
        assert cfg.lr == 1e-4, (
            f"lr={cfg.lr}: the reference recipe pins lr to 1e-4 "
            "(reference model.py:52 asserts the same); remove that guard "
            "in both frameworks to experiment with other rates"
        )
        self.tx = {name: optax.adamw(cfg.lr, weight_decay=0.0) for name in NET_NAMES}
        opt = {name: self.tx[name].init(params[name]) for name in NET_NAMES}

        self.state = {
            "params": params,
            "stats": stats,
            "opt": opt,
            "pruned": jnp.asarray(self.mask.pruned),
        }

    # -------------------------------------------------------------- properties
    @property
    def num_low_frequencies(self) -> int:
        # model.py:162
        if self.cfg.get("sparsity") is None:
            # the 'mask'/'taylor' kinds build without sparsity, but the
            # ACS width still needs it — fail with the cause, not a bare
            # int*None TypeError (the reference crashes the same way at
            # model.py:162; surfacing it at build is strictly clearer)
            raise ValueError(
                "cfg.sparsity is required to derive num_low_frequencies "
                "(ACS width = shape * sparsity * 0.32); pass --sparsity"
            )
        return int(self.cfg.shape * self.cfg.sparsity * 0.32)

    def train(self, mode=True):
        self.training = mode
        return self

    def eval(self):
        return self.train(False)

    def to(self, device=None):  # device residency is implicit in JAX
        return self

    # ---------------------------------------------------------------- forward
    def _apply_T(self, params, stats, img_aux_abs, img_sampled_abs, train):
        if train:
            def fwd(params, stats, a, b):
                return self.net_T.apply(
                    {"params": params, "batch_stats": stats}, a, b,
                    train=True, mutable=["batch_stats"],
                )

            if _remat_tg(img_aux_abs.shape[0]):
                fwd = jax.checkpoint(fwd)
            (offset, grid), upd = fwd(
                params, stats, img_aux_abs, img_sampled_abs
            )
            return offset, grid, upd["batch_stats"]
        offset, grid = self.net_T.apply(
            {"params": params, "batch_stats": stats},
            img_aux_abs, img_sampled_abs, train=False,
        )
        return offset, grid, stats

    def _apply_G(self, params, stats, x, train):
        if train:
            def fwd(params, stats, x):
                return self.net_G.apply(
                    {"params": params, "batch_stats": stats}, x,
                    train=True, mutable=["batch_stats"],
                )

            if _remat_tg(x.shape[0], threshold=12):
                fwd = jax.checkpoint(fwd)
            out, upd = fwd(params, stats, x)
            return out, upd["batch_stats"]
        return self.net_G.apply(
            {"params": params, "batch_stats": stats}, x, train=False
        ), stats

    def _apply_D(self, params, stats, x, train):
        variables = {"params": params, "batch_stats": stats}
        if train:
            out, upd = self.net_D.apply(
                variables, x, train=True, mutable=["batch_stats"]
            )
            return out, upd["batch_stats"]
        return self.net_D.apply(variables, x, train=False), stats

    def _forward_R(self, params_R, k_sampled, pruned, img_warped,
                   train=False):
        mask_bool = jnp.logical_not(pruned)[None, None, None, :]
        # train picks the s2d execution layout (same params, see build);
        # eval/serving keep the plain layout the b128 serving bench chose
        net = self.net_R_train if train else self.net_R
        return net.apply(
            {"params": params_R}, k_sampled, mask_bool, img_warped,
            self.num_low_frequencies,
        )

    def _prepare(self, img_full, img_aux, pruned, mask_params=None, key=None):
        """set_input equivalent (model.py:89-121).

        With cfg.learn_mask and a LOUPE mask, undersampling uses the
        differentiable soft-sigmoid sample (masks.py:185-188 semantics) so
        gradients reach the mask logits; otherwise the fixed pruned vector
        applies outside the gradient path (model.py:111-113).
        """
        img_k_full = fft2(img_full)
        if (
            mask_params is not None
            and key is not None
            and self.cfg.mask == "loupe"
            and bool(self.cfg.get("learn_mask", False))
        ):
            soft, _ = masks_lib.loupe_sample(
                mask_params["weight"], self.cfg.sparsity,
                self.mask.pmask_slope, self.mask.sample_slope,
                key, batch=img_full.shape[0], training=True,
            )
            img_k_sampled = img_k_full * soft[:, None, None, :]
        else:
            img_k_sampled = jax.lax.stop_gradient(
                masks_lib.apply_mask(img_k_full, pruned)
            )
        img_sampled = ifft2(img_k_sampled)
        return {
            "pruned": pruned,
            "img_full": img_full,
            "img_aux": img_aux,
            "img_k_full": img_k_full,
            "img_k_sampled": img_k_sampled,
            "img_sampled": img_sampled,
            "img_full_rss": rss(img_full),
            "img_sampled_rss": rss(img_sampled),
            "img_aux_rss": rss(img_aux),
        }

    def _forward_TGR(self, params, stats, env, train, with_G, with_R,
                     stop_T=False):
        """Compose forwardT [+G] [+R]; returns (losses, imgs, stats')."""
        aux_abs = jnp.abs(env["img_aux"])
        sampled_abs = jnp.abs(env["img_sampled"])
        offset, grid, stats_T = self._apply_T(
            params["net_T"], stats["net_T"], aux_abs, sampled_abs, train
        )
        if stop_T:
            offset = jax.lax.stop_gradient(offset)
            grid = jax.lax.stop_gradient(grid)
        img_warped = warp(aux_abs, grid)
        img_warped_rss = rss(img_warped)
        losses = {"loss_smooth": gradient_loss(offset)}
        imgs = {
            "img_offset": offset,
            "img_warped": img_warped,
            "img_warped_rss": img_warped_rss,
        }
        stats = {**stats, "net_T": stats_T}

        if with_G:
            # forwardG (model.py:123-140): synthesis/warp commutativity
            n = env["img_aux_rss"].shape[0]
            n1 = (n + 1) // 2
            aux_TR = env["img_aux_rss"][:n1]
            aux_RT = env["img_aux_rss"][n1:]
            T, stats_G = self._apply_G(
                params["net_G"], stats["net_G"], aux_RT, train
            )
            warped_all = warp(jnp.concatenate([aux_TR, T], axis=0), grid)
            R, RT = warped_all[:n1], warped_all[n1:]
            TR, stats_G = self._apply_G(params["net_G"], stats_G, R, train)
            img_synth = jnp.concatenate([R, T], axis=0)
            img_aligned = jnp.concatenate([TR, RT], axis=0)
            losses["loss_gan_sim"] = jnp.mean(
                jnp.abs(img_aligned - env["img_full_rss"])
            )
            imgs["img_synth"] = img_synth
            imgs["img_aligned"] = img_aligned
            stats = {**stats, "net_G": stats_G}

        if with_R:
            img_rec = self._forward_R(
                params["net_R"], env["img_k_sampled"], env["pruned"],
                img_warped, train=train,
            )
            losses["loss_sim"] = ssimloss(env["img_full_rss"], img_rec)
            imgs["img_rec"] = img_rec

        return losses, imgs, stats

    # ------------------------------------------------------------- train steps
    def _dp_active(self, batch_shape, warn=True):
        mesh = getattr(self, "mesh", None)
        if mesh is None:
            return False
        if batch_shape[0] % mesh.size != 0:
            # fall back to a replicated single-program step, but say so —
            # silently running 1/N of the advertised throughput (or OOMing
            # on one device) reads as a kernel bug otherwise. Serving
            # (reconstruct) passes warn=False: arbitrary request batch
            # sizes are expected there and the fallback is by design.
            if warn and batch_shape not in getattr(self, "_dp_warned", set()):
                self._dp_warned = getattr(self, "_dp_warned", set())
                self._dp_warned.add(batch_shape)
                print(
                    f"WARNING: batch {batch_shape[0]} does not divide the "
                    f"{mesh.size}-device mesh; this batch runs UNSHARDED "
                    "on one device (pick a divisible batch size)",
                    flush=True,
                )
            return False
        return True

    @staticmethod
    def _with_zero_chan(x):
        """cat a zero channel: net_D takes 2 channels, the second unused
        by the live path (reference model.py:171-184 cat with zeros)."""
        return jnp.concatenate([x, jnp.zeros_like(x)], axis=1)

    def _regime_loss(self, p, stats, env, regime):
        """G-phase training loss (reference model.py:193-232): weighted
        sim/smooth/gan_sim plus the generator adversarial term evaluated
        THROUGH net_D with frozen D params (forwardD, D_loss=False).
        Single source of truth for both the plain and grad-accum steps.
        Returns (total, losses, imgs, new_stats)."""
        cfg = self.cfg
        with_G = regime in ("Mixed", "GAN-Only")
        with_R = regime in ("None", "Rec", "Mixed")
        losses, imgs, new_stats = self._forward_TGR(
            p, stats, env, train=True, with_G=with_G, with_R=with_R,
            stop_T=(regime == "None"),
        )
        total = 0.0
        if with_R:
            total += losses["loss_sim"] * cfg.weight_sim
        if regime != "None":
            total += losses["loss_smooth"] * cfg.weight_smooth
        if with_G:
            total += losses["loss_gan_sim"] * cfg.weight_gan_sim
            # D params come from p but are NOT in the differentiated
            # subtree — grads flow through D, not to it
            fake = self._with_zero_chan(imgs["img_aligned"])
            pred_fake, stats_D = self._apply_D(
                p["net_D"], new_stats["net_D"], fake, True,
            )
            losses["loss_gan_G"] = loss_gan(
                pred_fake, real=False, D_loss=False
            )
            total += losses["loss_gan_G"] * cfg.weight_gan
            new_stats = {**new_stats, "net_D": stats_D}
        losses["loss_all"] = total
        return total, losses, imgs, new_stats

    def _d_phase_loss_fn(self, img_aligned, img_full_rss, stats_D):
        """Second-pass discriminator loss on detached fake/real
        (reference model.py:234-239); shared by both step builders."""
        fake = jax.lax.stop_gradient(self._with_zero_chan(img_aligned))
        real = jax.lax.stop_gradient(self._with_zero_chan(img_full_rss))
        w_gan = self.cfg.weight_gan

        def loss_fn_D(pD):
            pred_fake, sD = self._apply_D(pD, stats_D, fake, True)
            pred_real, sD = self._apply_D(pD, sD, real, True)
            lf = loss_gan(pred_fake, real=False, D_loss=True)
            lr = loss_gan(pred_real, real=True, D_loss=True)
            return (lf + lr) * w_gan, (lf, lr, sD)

        return loss_fn_D

    def _make_train_step(self, regime, batch_shape):
        """Jitted train step; data-parallel over self.mesh when distributed
        (and the batch divides the mesh — otherwise fall back to a
        replicated single-program step)."""
        accum = int(self.cfg.get("grad_accum", 1))
        if regime in ("Mixed", "GAN-Only") and batch_shape[0] // accum < 2:
            # forwardG halves the batch for the synthesis/warp crossover
            # (reference model.py:125-136, torch.chunk raises there too);
            # batch 1 would push an EMPTY half through NetG's BatchNorm,
            # whose mean-over-0-rows silently NaN-poisons net_G params
            # while every reported loss stays finite
            raise ValueError(
                f"{regime} regime needs >= 2 samples per (micro-)batch "
                f"for the forwardG crossover; got batch {batch_shape[0]} "
                f"with grad_accum {accum}"
            )
        fn = (
            self._make_accum_step_fn(regime, accum)
            if accum > 1
            else self._make_train_step_fn(regime)
        )
        if self._dp_active(batch_shape):
            from jax.sharding import NamedSharding, PartitionSpec
            from ..parallel.mesh import dp_shardings

            state_s, batch_s = dp_shardings(self.mesh, self.state)
            key_s = NamedSharding(self.mesh, PartitionSpec())
            return jax.jit(
                fn,
                in_shardings=(state_s, batch_s, batch_s, key_s),
                donate_argnums=(0,),
            )
        return jax.jit(fn, donate_argnums=(0,))

    def _make_train_step_fn(self, regime):
        cfg = self.cfg
        with_G = regime in ("Mixed", "GAN-Only")
        learn_mask = cfg.mask == "loupe" and bool(cfg.get("learn_mask", False))
        grad_nets = GRAD_NETS[regime]
        if learn_mask and regime in ("None", "Rec", "Mixed"):
            grad_nets = grad_nets + ("net_mask",)

        def step(state, img_full, img_aux, key):
            params = state["params"]
            stats = state["stats"]
            env0 = (
                None if learn_mask
                else self._prepare(img_full, img_aux, state["pruned"])
            )

            def loss_fn(train_params):
                p = {**params, **train_params}
                env = (
                    self._prepare(img_full, img_aux, state["pruned"],
                                  p["net_mask"], key)
                    if learn_mask else env0
                )
                total, losses, imgs, new_stats = self._regime_loss(
                    p, stats, env, regime
                )
                return total, (losses, imgs, new_stats, env)

            train_params = {k: params[k] for k in grad_nets}
            grads, (losses, imgs, new_stats, env) = jax.grad(
                loss_fn, has_aux=True
            )(train_params)

            new_params = dict(params)
            new_opt = dict(state["opt"])
            for name in grad_nets:
                updates, new_opt[name] = self.tx[name].update(
                    grads[name], state["opt"][name], params[name]
                )
                new_params[name] = optax.apply_updates(params[name], updates)

            if with_G:
                # second pass: discriminator update on detached fake/real
                # (model.py:234-239)
                loss_fn_D = self._d_phase_loss_fn(
                    imgs["img_aligned"], env["img_full_rss"],
                    new_stats["net_D"],
                )
                gD, (lf, lr, sD) = jax.grad(loss_fn_D, has_aux=True)(
                    params["net_D"]
                )
                updates, new_opt["net_D"] = self.tx["net_D"].update(
                    gD, state["opt"]["net_D"], params["net_D"]
                )
                new_params["net_D"] = optax.apply_updates(
                    params["net_D"], updates
                )
                new_stats = {**new_stats, "net_D": sD}
                losses["loss_gan_Dfake"] = lf
                losses["loss_gan_Dreal"] = lr

            new_pruned = state["pruned"]
            if learn_mask:
                # refresh the hard mask from the updated LOUPE logits
                # (masks.py:178-183 eval-path semantics)
                _, new_pruned = masks_lib.loupe_sample(
                    new_params["net_mask"]["weight"], cfg.sparsity,
                    self.mask.pmask_slope, self.mask.sample_slope,
                    jax.random.fold_in(key, 1), batch=1, training=False,
                )

            new_state = {
                "params": new_params,
                "stats": new_stats,
                "opt": new_opt,
                "pruned": new_pruned,
            }
            # scalars only: train.py reads get_vis('scalars'/'histograms')
            # from the train step — image grids come from test() on the vis
            # batch. Returning the 7+ full-batch image arrays here forced
            # XLA to materialize them every step (outputs can't be DCE'd)
            # and kept them alive in _aux until the next step.
            del imgs
            return new_state, dict(losses)

        return step

    def _make_accum_step_fn(self, regime, accum):
        """Gradient-accumulation train step (cfg.grad_accum > 1).

        The global batch is split into `accum` micro-batches scanned
        sequentially; gradients AVERAGE across micro-batches before ONE
        optimizer step per network (large effective batches beyond HBM
        limits). Framework-defined semantics for the GAN regimes (the
        reference's two-pass update, model.py:193-259, has no accumulation
        there): the G-phase (net_T/net_G/net_R + the through-D adversarial
        term against frozen D) accumulates into one step, and the D-phase
        gradients on detached per-micro-batch fakes accumulate into one D
        step — preserving the reference's one-G-step/one-D-step alternation
        per global batch. Micro-batches with the forwardG crossover split
        each TR/RT half (model.py:198-210), so the half pairing matches the
        full-batch step. BatchNorm stats update sequentially per
        micro-batch (torch grad-accum convention).
        """
        cfg = self.cfg
        with_G = regime in ("Mixed", "GAN-Only")
        assert not cfg.get("learn_mask", False), (
            "grad_accum does not route gradients to the LOUPE mask; "
            "disable learn_mask or grad_accum"
        )
        grad_nets = GRAD_NETS[regime]

        def _split(x, n):
            m = n // accum
            if not with_G:
                return x.reshape(accum, m, *x.shape[1:])
            # keep the TR/RT half pairing of the full batch: micro-batch i
            # takes slice i of the first half then slice i of the second
            assert m % 2 == 0, (
                f"GAN-regime micro-batches must be even for the forwardG "
                f"crossover: batch {n} / accum {accum} = {m}"
            )
            half, m2 = n // 2, m // 2
            fh = x[:half].reshape(accum, m2, *x.shape[1:])
            sh = x[half:].reshape(accum, m2, *x.shape[1:])
            return jnp.concatenate([fh, sh], axis=1)

        def step(state, img_full, img_aux, key):
            n = img_full.shape[0]
            assert n % accum == 0, (n, accum)
            mf = _split(img_full, n)
            ma = _split(img_aux, n)
            params = state["params"]

            def loss_fn(train_params, stats, f, a):
                p = {**params, **train_params}
                env = self._prepare(f, a, state["pruned"])
                total, losses, imgs, new_stats = self._regime_loss(
                    p, stats, env, regime
                )
                return total, (losses, imgs, new_stats, env)

            train_params = {k: params[k] for k in grad_nets}
            zero_grads = jax.tree_util.tree_map(jnp.zeros_like, train_params)
            zero_gD = (
                jax.tree_util.tree_map(jnp.zeros_like, params["net_D"])
                if with_G else None
            )

            def _reset_sn(stats, init):
                """Reset spectral-norm u/v estimates to the global step's
                initial values: the reference runs ONE power-iteration
                sequence per optimizer step (one forward per step), so
                micro-batches must not compound extra iterations — and
                with frozen u/v, identical micro-batches produce identical
                gradients (the accum==full-batch contract). BN running
                stats still thread sequentially (torch convention)."""
                if isinstance(stats, dict):
                    return {
                        k: (init[k] if k in ("u", "v")
                            else _reset_sn(stats[k], init[k]))
                        for k in stats
                    }
                return stats

            def body(carry, xs):
                g_acc, gD_acc, stats = carry
                f, a = xs
                stats = _reset_sn(stats, state["stats"])
                grads, (losses, imgs, new_stats, env) = jax.grad(
                    loss_fn, has_aux=True
                )(train_params, stats, f, a)
                g_acc = jax.tree_util.tree_map(jnp.add, g_acc, grads)
                if with_G:
                    # D-phase on detached micro-batch fakes (model.py:234-239)
                    loss_fn_D = self._d_phase_loss_fn(
                        imgs["img_aligned"], env["img_full_rss"],
                        new_stats["net_D"],
                    )
                    gD, (lf, lr, sD) = jax.grad(loss_fn_D, has_aux=True)(
                        params["net_D"]
                    )
                    gD_acc = jax.tree_util.tree_map(jnp.add, gD_acc, gD)
                    new_stats = {**new_stats, "net_D": sD}
                    losses["loss_gan_Dfake"] = lf
                    losses["loss_gan_Dreal"] = lr
                return (g_acc, gD_acc, new_stats), (losses, imgs, env)

            (g_sum, gD_sum, new_stats), (losses, imgs, env) = jax.lax.scan(
                body, (zero_grads, zero_gD, state["stats"]), (mf, ma)
            )
            grads = jax.tree_util.tree_map(lambda g: g / accum, g_sum)

            new_params = dict(params)
            new_opt = dict(state["opt"])
            for name in grad_nets:
                updates, new_opt[name] = self.tx[name].update(
                    grads[name], state["opt"][name], params[name]
                )
                new_params[name] = optax.apply_updates(params[name], updates)
            if with_G:
                gD = jax.tree_util.tree_map(lambda g: g / accum, gD_sum)
                updates, new_opt["net_D"] = self.tx["net_D"].update(
                    gD, state["opt"]["net_D"], params["net_D"]
                )
                new_params["net_D"] = optax.apply_updates(
                    params["net_D"], updates
                )

            new_state = {
                "params": new_params,
                "stats": new_stats,
                "opt": new_opt,
                "pruned": state["pruned"],
            }
            # scalars only (micro-batch losses averaged) — same rationale
            # as the plain train step: nothing reads train-step images
            del imgs, env
            return new_state, {k: jnp.mean(v) for k, v in losses.items()}

        return step

    def _make_test_step(self, batch_shape, masked=False):
        fn = self._make_test_step_fn(masked=masked)
        if self._dp_active(batch_shape):
            from jax.sharding import NamedSharding, PartitionSpec
            from ..parallel.mesh import dp_shardings

            state_s, batch_s = dp_shardings(self.mesh, self.state)
            shardings = [state_s, batch_s, batch_s]
            if masked:
                shardings.append(NamedSharding(self.mesh, PartitionSpec()))
            return jax.jit(fn, in_shardings=tuple(shardings))
        return jax.jit(fn)

    def _make_test_step_fn(self, masked=False):
        def step(state, img_full, img_aux, valid=None):
            env = self._prepare(img_full, img_aux, state["pruned"])
            losses, imgs, _ = self._forward_TGR(
                state["params"], state["stats"], env, train=False,
                with_G=True, with_R=True,
            )
            mask_vis = fftshift2(
                jnp.broadcast_to(
                    (1.0 - state["pruned"].astype(jnp.float32))[None, None, None, :],
                    env["img_full_rss"].shape,
                )
            )
            aux = {**losses,
                   "img_full_rss": env["img_full_rss"],
                   "img_sampled_rss": env["img_sampled_rss"],
                   "img_aux_rss": env["img_aux_rss"],
                   "img_mask": mask_vis,
                   **imgs}
            # on-device eval metrics (model.py:275-279 equivalents):
            # scalars only cross to the host, never image batches
            full = env["img_full_rss"].astype(jnp.float32)
            rec = imgs["img_rec"].astype(jnp.float32)
            warped = imgs["img_warped_rss"].astype(jnp.float32)
            if not masked:
                aux["metric_MI"] = jmetrics.mi(full, warped)
                aux["metric_PSNR"] = jmetrics.psnr(full, rec)
                aux["metric_SSIM"] = jmetrics.ssim(full, rec)
                aux["metric_MAE"] = jmetrics.mae(full, rec)
                aux["metric_MSE"] = jmetrics.mse(full, rec)
                return aux

            # bucketed eval: pad slices (valid == 0) are excluded from
            # every reported scalar; `valid` is a dynamic input, so any
            # slice count reuses this compiled step for its bucket size
            w = valid.astype(jnp.float32)
            n = jnp.sum(w)

            def wmean(per_slice):
                return jnp.sum(per_slice * w) / n

            mse_s = jmetrics.mse_per_slice(full, rec)
            aux["metric_MI"] = wmean(jmetrics.mi_per_slice(full, warped))
            aux["metric_PSNR"] = 10.0 * jnp.log10(1.0 / wmean(mse_s))
            ssim_s = jmetrics.ssim_per_slice(full, rec)
            aux["metric_SSIM"] = wmean(ssim_s)
            aux["metric_MAE"] = wmean(jmetrics.mae_per_slice(full, rec))
            aux["metric_MSE"] = wmean(mse_s)
            # the raw losses were reduced over pad slices too — recompute
            # the scalar losses as masked per-slice means (values match
            # the unpadded step: every contributing op is per-sample)
            aux["loss_sim"] = 1.0 - wmean(ssim_s)
            if "img_aligned" in imgs:
                aux["loss_gan_sim"] = wmean(jnp.mean(
                    jnp.abs(imgs["img_aligned"].astype(jnp.float32) - full),
                    axis=(1, 2, 3),
                ))
            aux["loss_smooth"] = wmean(jax.vmap(
                lambda o: gradient_loss(o[None])
            )(imgs["img_offset"]))
            return aux

        return step

    # ------------------------------------------------------------- public API
    def distribute(self, mesh):
        """Enable data parallelism over a jax.sharding.Mesh with axis 'data':
        params/opt replicated, batch sharded over the leading axis; XLA's
        SPMD partitioner inserts the gradient all-reduce over ICI."""
        self.mesh = mesh
        self._step_cache = {}
        from ..parallel.mesh import replicate_state

        self.state = replicate_state(mesh, self.state)
        return self

    def set_input(self, img_full, img_aux=None):
        mesh = getattr(self, "mesh", None)
        if mesh is not None and jax.process_count() > 1:
            # multi-host: the caller passes this process's LOCAL shard of
            # the global batch (rows for its addressable devices); glue the
            # shards into one global array without cross-host copies.
            # Device inputs (the jit-preprocessed train batches) stay on
            # device — transfer.multihost_to_device slices them
            # device-to-device instead of forcing a host round trip.
            from ..parallel.mesh import shard_batch_multihost

            if img_aux is None:
                if isinstance(img_full, jax.Array):
                    img_aux = jnp.zeros_like(img_full)
                else:
                    img_aux = np.zeros_like(np.asarray(img_full))
            img_full, img_aux = shard_batch_multihost(
                mesh, (img_full, img_aux)
            )
            self._batch = (img_full, img_aux)
            return
        from ..utils.transfer import to_device

        img_full = to_device(img_full)
        if img_aux is None:
            img_aux = jnp.zeros_like(img_full)
        else:
            img_aux = to_device(img_aux)
        if self._dp_active(img_full.shape):
            from ..parallel.mesh import shard_batch

            img_full, img_aux = shard_batch(self.mesh, (img_full, img_aux))
        self._batch = (img_full, img_aux)

    def update(self):
        assert self.training
        regime = self.cfg.reg
        key = ("train", regime, self._batch[0].shape)
        if key not in self._step_cache:
            self._step_cache[key] = self._make_train_step(
                regime, self._batch[0].shape
            )
        self._rng, sub = jax.random.split(self._rng)
        self.state, aux = self._step_cache[key](self.state, *self._batch, sub)
        self._aux = aux

    def test(self, valid=None, sync=True):
        """Eval step. valid: optional float/bool [N] slice-validity vector
        for bucketed (padded) batches — pad slices are masked out of every
        reported scalar. A dynamic input: volumes with different slice
        counts padded to the same bucket share one compiled step.

        sync=False dispatches the step and returns None without a host
        readback — callers pipelining volumes (eval.py) read the previous
        volume's scalars while this one computes."""
        assert not self.training
        masked = valid is not None
        key = ("test", self._batch[0].shape, masked)
        if key not in self._step_cache:
            self._step_cache[key] = self._make_test_step(
                self._batch[0].shape, masked=masked
            )
        extra = (jnp.asarray(valid),) if masked else ()
        aux = dict(self._step_cache[key](self.state, *self._batch, *extra))
        self._aux = aux
        if not sync:
            return None
        if self.cfg.reg == "GAN-Only":
            return -float(aux["metric_MI"])
        return -float(aux["metric_PSNR"])

    def get_vis(self, content=None):
        assert content in [None, "scalars", "histograms", "images"]
        vis = {}
        if content in ("scalars", None):
            vis["scalars"] = {}
            for k, v in self._aux.items():
                if k.startswith("loss_"):
                    vis["scalars"][k] = float(v)
                elif k.startswith("metric_"):
                    vis["scalars"][k] = float(v)
        if content in ("images", None):
            vis["images"] = {}
            for k, v in self._aux.items():
                if (
                    k.startswith("img_")
                    and hasattr(v, "ndim")
                    and v.ndim == 4
                    and v.shape[1] in (1, 3)
                    and not jnp.iscomplexobj(v)
                ):
                    vis["images"][k] = np.asarray(v)
        if content in ("histograms", None):
            vis["histograms"] = {}
            # taylor saliency lives host-side (prune() must not grow the
            # params pytree — cached sharded steps depend on its
            # structure) and is fresher than any weight slot a taylor
            # checkpoint load recreated; learnable kinds only ever have
            # the params weight
            w = getattr(self, "_taylor_saliency", None)
            if w is None:
                w = self.state["params"]["net_mask"].get("weight")
            if w is not None:
                vis["histograms"]["weights"] = {"values": np.asarray(w)}
        return vis

    # ------------------------------------------------------------- serving
    def reconstruct(self, img_full, img_aux=None):
        """Serving path: undersample per the model's mask and reconstruct.

        img_full: complex [N, coils, H, W] fully-sampled target image (the
        k-space is derived with the model's own mask — matching eval
        semantics); img_aux: reference modality or None. Returns the
        aligned-reference-guided reconstruction [N, 1, H, W] (real).
        Eval-mode, jitted, cached per batch shape.

        On a distributed model (after .distribute(mesh)) the batch is
        sharded across the mesh — serving throughput scales with chips
        (the models are replicated; slices are independent).
        """
        from ..utils.transfer import to_device

        img_full = to_device(img_full)
        img_aux = (
            jnp.zeros_like(img_full) if img_aux is None else to_device(img_aux)
        )
        dp = self._dp_active(img_full.shape, warn=False)
        if dp:
            from ..parallel.mesh import shard_batch

            img_full, img_aux = shard_batch(self.mesh, (img_full, img_aux))
        key = ("recon", img_full.shape, dp)
        if key not in self._step_cache:
            if dp:
                from jax.sharding import NamedSharding, PartitionSpec
                from ..parallel.mesh import dp_shardings

                state_s, batch_s = dp_shardings(self.mesh, self.state)
                out_s = NamedSharding(
                    self.mesh, PartitionSpec(self.mesh.axis_names[0])
                )
                self._step_cache[key] = jax.jit(
                    self.recon_step,
                    in_shardings=(state_s, batch_s, batch_s),
                    out_shardings=out_s,
                )
            else:
                self._step_cache[key] = jax.jit(self.recon_step)
        return self._step_cache[key](self.state, img_full, img_aux)

    def recon_step(self, state, img_full, img_aux):
        """The eval-mode serving computation — the single source of truth
        shared by reconstruct() and engine/export.py's AOT artifact (a
        duplicated closure there could silently diverge from the live
        serving path)."""
        env = self._prepare(img_full, img_aux, state["pruned"])
        _, imgs, _ = self._forward_TGR(
            state["params"], state["stats"], env, train=False,
            with_G=False, with_R=True,
        )
        return imgs["img_rec"]

    # ------------------------------------------------------------- pruning
    def taylor_step(self):
        """Accumulate Taylor saliency for the current batch: the squared
        gradient of the regime loss wrt a per-line k-space multiplier
        (reference masks.py:232-244 backward-hook equivalent). Call after
        set_input; values accumulate host-side until prune()."""
        assert self.cfg.mask == "taylor"
        key = ("taylor", self._batch[0].shape)
        if key not in self._step_cache:

            def saliency(state, img_full, img_aux):
                def loss_of_mask(mask_vec):
                    img_k_full = fft2(img_full)
                    keep = (1.0 - state["pruned"].astype(jnp.float32)) * mask_vec
                    env = {
                        "pruned": state["pruned"],
                        "img_full": img_full,
                        "img_aux": img_aux,
                        "img_k_sampled": img_k_full * keep[None, None, None, :],
                        "img_full_rss": rss(img_full),
                        "img_aux_rss": rss(img_aux),
                    }
                    env["img_sampled"] = ifft2(env["img_k_sampled"])
                    losses, _, _ = self._forward_TGR(
                        state["params"], state["stats"], env, train=False,
                        with_G=False, with_R=True,
                    )
                    return losses["loss_sim"] * self.cfg.weight_sim

                g = jax.grad(loss_of_mask)(
                    jnp.ones(self.cfg.shape, jnp.float32)
                )
                return g * g

            self._step_cache[key] = jax.jit(saliency)
        val = self._step_cache[key](self.state, *self._batch)
        self._taylor_values = getattr(self, "_taylor_values", [])
        self._taylor_values.append(np.asarray(val))

    def prune(self, num, thres=1.0, random=0.0):
        """Prune `num` k-space lines per the mask kind (reference
        masks.py:17-38 magnitude / 214-229 Taylor-saliency policies)."""
        kind = self.cfg.mask
        pruned = np.asarray(self.state["pruned"])
        if kind in ("mask", "standard", "equispaced", "lowpass"):
            # magnitude policy (all reference Mask subclasses inherit it,
            # masks.py:17-38); fixed masks carry an implicit all-ones weight
            # so default thres=1 prunes nothing there, as in the reference
            w = self.state["params"]["net_mask"].get("weight")
            weight = (
                np.asarray(w) if w is not None
                else np.ones(self.cfg.shape, np.float32)
            )
            # persistent generator: successive prune() rounds must draw
            # fresh jitter like the reference's torch.rand_like, not replay
            # one fixed noise vector
            if not hasattr(self, "_prune_rng"):
                self._prune_rng = np.random.default_rng(self.seed)
            new = masks_lib.magnitude_prune(
                weight, pruned, num, thres, random, rng=self._prune_rng,
            )
        elif kind == "taylor":
            values = getattr(self, "_taylor_values", [])
            self._taylor_values = []
            if num == 0:
                return
            assert num > 0 and len(values) > 0
            w = np.stack(values, 0).mean(0)
            w[pruned] = w.max()
            new = pruned.copy()
            order = np.argsort(w)
            new[order[:num]] = True
            # surface the averaged saliency like the reference (TaylorMask
            # .prune stores it in net_mask.weight, masks.py:228) so the
            # get_vis('histograms') weights diagnostic appears. Host-side
            # attr, NOT params['net_mask']['weight']: adding a key there
            # would change the state pytree STRUCTURE and invalidate every
            # cached jitted step (under --data_parallel the stale
            # in_shardings crash with a prefix-pytree mismatch at the next
            # update()).
            self._taylor_saliency = w
        elif kind == "loupe":
            return  # LOUPE prunes via its probability mask, not here
        else:
            raise AssertionError(f"mask kind {kind!r} does not prune")
        self.state["pruned"] = jnp.asarray(new)

    # ------------------------------------------------------------- checkpoint
    def save(self, path, objects=None, with_opt=False):
        """Directory checkpoint (reference format). with_opt=True adds an
        `opt_state` entry for exact optimizer-moment resume — an extension
        the reference lacks (basemodel.py:149-152 drops optimizer state);
        loaders ignore it unless present."""
        names = objects if objects is not None else list(NET_NAMES)
        ckpt = {}
        for name in names:
            entry = {"params": self.state["params"][name]}
            if name in self.state["stats"]:
                entry["stats"] = self.state["stats"][name]
            if name == "net_mask":
                entry["pruned"] = np.asarray(self.state["pruned"])
                sal = getattr(self, "_taylor_saliency", None)
                if sal is not None:
                    # Taylor saliency lives host-side (prune() must not
                    # grow the live params pytree) but checkpoints as
                    # net_mask.weight like the reference (masks.py:228);
                    # load() recreates the slot before any step caching
                    entry["params"] = dict(
                        self.state["params"]["net_mask"],
                        weight=np.asarray(sal, dtype=np.float32),
                    )
            ckpt[name] = entry
        if with_opt:
            from flax import serialization

            ckpt["opt_state"] = flatten_tree(
                serialization.to_state_dict(self.state["opt"])
            )
        ckpt["config"] = self.cfg
        ckpt_save(ckpt, path)

    def load(self, ckpt, cfg=None, objects=None):
        loaded = ckpt_load(ckpt)
        if cfg is None:
            cfg = loaded.pop("config")
        elif "config" in loaded:
            loaded.pop("config")
        self.build(cfg)
        names = objects if objects is not None else [
            k for k in loaded.keys() if k in NET_NAMES
        ]
        opt_flat = loaded.get("opt_state") if objects is None else None
        for name in names:
            assert name in loaded, f"{name} not in checkpoint"
            flat = loaded[name]  # flat {'params/...': arr, 'stats/...': arr}
            if name in NET_NAMES:
                from .torch_compat import is_reference_entry, convert_net_state

                if is_reference_entry(flat):
                    # raw reference torch state_dict (legacy torch file or
                    # reference npz-of-state_dict save, basemodel.py:17-41):
                    # convert in place so reference ckpts are first-class
                    flat = convert_net_state(
                        name, flat, cfg, self.state["params"].get(name, {})
                    )
                    assert flat is not None, f"cannot convert entry {name}"
            params_flat = {
                k[len("params/"):]: v for k, v in flat.items()
                if k.startswith("params/")
            }
            if name == "net_mask" and "weight" in params_flat and (
                "weight" not in self.state["params"]["net_mask"]
            ):
                # a pruned Taylor mask checkpoints its averaged saliency as
                # net_mask.weight (reference masks.py:228 stores it in the
                # weight buffer); fresh taylor builds start without the
                # slot — create it so the snapshot round-trips
                self.state["params"]["net_mask"] = dict(
                    self.state["params"]["net_mask"],
                    weight=jnp.zeros(
                        np.asarray(params_flat["weight"]).shape, jnp.float32
                    ),
                )
            stats_flat = {
                k[len("stats/"):]: v for k, v in flat.items()
                if k.startswith("stats/")
            }
            if params_flat:
                self.state["params"][name] = self._merge_like(
                    self.state["params"][name], params_flat
                )
            if stats_flat and name in self.state["stats"]:
                self.state["stats"][name] = self._merge_like(
                    self.state["stats"][name], stats_flat
                )
            if name == "net_mask" and "pruned" in flat:
                self.state["pruned"] = jnp.asarray(
                    np.asarray(flat["pruned"]).astype(bool)
                )
            # re-init this net's optimizer state on fresh params
            self.state["opt"][name] = self.tx[name].init(
                self.state["params"][name]
            )
        if opt_flat:
            # exact moment restore when the ckpt carries opt_state
            from flax import serialization

            template = serialization.to_state_dict(self.state["opt"])
            restored = self._merge_like(template, opt_flat)
            self.state["opt"] = serialization.from_state_dict(
                self.state["opt"], restored
            )

    @staticmethod
    def _merge_like(template, flat):
        """Rebuild a tree with the TEMPLATE's nested structure from a flat
        {joined/path: array} mapping. Walking the template (rather than
        splitting keys on '/') is essential: flax SpectralNorm variable
        names legitimately contain '/' (e.g. 'Conv_0/kernel/u'), so the
        joined path string is ambiguous but the template structure is not.
        """
        t_flat = flatten_tree(template)
        extra = set(flat.keys()) - set(t_flat.keys())
        missing = set(t_flat.keys()) - set(flat.keys())
        assert not extra and not missing, (
            "checkpoint/param tree mismatch: "
            f"missing={sorted(missing)[:5]} extra={sorted(extra)[:5]}"
        )

        def walk(node, prefix):
            if isinstance(node, dict):
                return {k: walk(v, f"{prefix}{k}/") for k, v in node.items()}
            key = prefix[:-1]
            return jnp.asarray(flat[key]).astype(node.dtype)

        return walk(template, "")
