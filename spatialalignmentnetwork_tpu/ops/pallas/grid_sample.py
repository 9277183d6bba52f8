"""Pallas TPU kernel for bilinear grid sampling.

TPU has no fast vector gather: a gather formulation of grid_sample (what
XLA's lowering produces) serializes on the scalar core. This kernel
reformulates the 4-tap bilinear sample as dense one-hot contractions that
run on the MXU/VPU instead:

  stage 1 (y-interp): rows[p, x] = sum_y Wy[p, y] * img[y, x]
      where Wy has two non-zeros per flattened output pixel p: (1-wy) at
      y0(p) and wy at y1(p); built in-register from broadcasted-iota
      comparisons. A [P, H] @ [H, W] matmul -> MXU.
  stage 2 (x-select): out[p] = sum_x rows[p, x] * Wx[p, x]
      with Wx holding (1-wx) at x0(p), wx at x1(p); elementwise multiply +
      row reduction -> VPU.

Grid dims: (N, C, H_out/BI). Each program handles a BI-row output block of
one (sample, channel) plane with the whole source plane resident in VMEM
(a 320x320 f32 plane is 400 KB; VMEM is ~16 MB).

Semantics match ops/grid_sample.grid_sample (align_corners=False, padding
modes zeros/border/reflection). Gradients via custom VJP (the backward
scatter-add is the transposed contraction, derived from the closed-form jnp
formulation).

Reference behavior being replaced: torch grid_sample call sites
cross.py:33-34, augment.py:60-61.
"""

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl


def _apply_padding(x, size_in, padding_mode):
    """Padding-mode coordinate transform (matches ops/grid_sample)."""
    if padding_mode == "reflection":
        low = -0.5
        span = float(size_in)
        t = jnp.abs(x - low)
        extra = jnp.mod(t, span)
        flips = jnp.floor(t / span)
        x = jnp.where(jnp.mod(flips, 2.0) == 0.0, extra + low, span - extra + low)
        x = jnp.clip(x, 0.0, size_in - 1.0)
    elif padding_mode == "border":
        x = jnp.clip(x, 0.0, size_in - 1.0)
    return x


def _kernel(img_ref, grid_ref, out_ref, *, h_in, w_in, bi, padding_mode,
            band):
    g = grid_ref[0]            # [BI, W_out, 2]
    gx = g[..., 0].astype(jnp.float32)
    gy = g[..., 1].astype(jnp.float32)

    ix = _apply_padding(((gx + 1.0) * w_in - 1.0) / 2.0, w_in, padding_mode)
    iy = _apply_padding(((gy + 1.0) * h_in - 1.0) / 2.0, h_in, padding_mode)

    wo = gx.shape[1]
    p = bi * wo
    iyf = iy.reshape(p, 1)

    # HIGHEST-precision matmuls (TPU default truncates f32 operands to
    # bf16, visibly corrupting the sampled image) need ~2.5x VMEM scratch;
    # process the block a few output rows at a time so each sub-pass's
    # live set fits. Chunking follows the BI axis (slices stay inside the
    # leading register tile, which Mosaic requires).
    rows_per = _fwd_rows_per(bi, wo, h_in, w_in)
    n_chunks = bi // rows_per
    pc = rows_per * wo

    # band analysis: displacement fields are smooth, so an output row block
    # usually reads a narrow band of source rows. Restrict the stage-1
    # contraction to that band ([P, band] @ [band, W]) — an h_in/band FLOP
    # cut — and fall back to the full contraction for blocks whose taps
    # exceed the band (large deformations). The needed-row range uses taps
    # clamped into [0, h-1]: out-of-range taps contribute zero and match no
    # band row regardless, so clamping only widens the band conservatively.
    y0i = jnp.floor(iyf).astype(jnp.int32)
    t0 = jnp.clip(y0i, 0, h_in - 1)
    t1 = jnp.clip(y0i + 1, 0, h_in - 1)
    band_lo = jnp.min(t0)
    band_hi = jnp.max(t1) + 1  # exclusive
    band_start = jnp.clip(band_lo, 0, max(h_in - band, 0))
    # Mosaic requires dynamic sublane-dim slice starts to be provable
    # multiples of 8; floor-align (the band only widens downward)
    band_start = pl.multiple_of((band_start // 8) * 8, 8)
    fits = band_hi - band_start <= band

    def run(src_rows, y_offset):
        """Sample all output rows of the block against `src_rows`.

        Bilinear tap weights form a tent: relu(1 - |row - y|) equals
        (1-frac) at floor(y), frac at floor(y)+1, and zero elsewhere —
        including every out-of-range tap (zero-pad semantics). For
        border/reflection the coords are pre-clamped into [0, size-1],
        where the tent reproduces the edge-folded weights exactly.
        """
        n_src = src_rows.shape[0]
        src = src_rows.astype(jnp.float32)
        for ci in range(n_chunks):
            r0 = ci * rows_per
            iy_c = iy[r0:r0 + rows_per].reshape(pc, 1)
            ix_c = ix[r0:r0 + rows_per].reshape(pc, 1)
            ys = (
                jax.lax.broadcasted_iota(jnp.int32, (pc, n_src), 1)
                + y_offset
            ).astype(jnp.float32)
            wy = jnp.maximum(1.0 - jnp.abs(ys - iy_c), 0.0)
            rows = jnp.dot(
                wy, src,
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            xs = jax.lax.broadcasted_iota(
                jnp.int32, (pc, w_in), 1
            ).astype(jnp.float32)
            wx = jnp.maximum(1.0 - jnp.abs(xs - ix_c), 0.0)
            out = jnp.sum(rows * wx, axis=1)
            out_ref[0, 0, r0:r0 + rows_per, :] = out.reshape(
                rows_per, wo
            ).astype(out_ref.dtype)

    @pl.when(fits)
    def _():
        run(img_ref[0, 0, pl.ds(band_start, band), :], band_start)

    @pl.when(jnp.logical_not(fits))
    def _():
        run(img_ref[0, 0], 0)


def _fwd_rows_per(bi, wo, h_in, w_in):
    """Rows processed per sub-pass inside the forward kernel: halve until
    the tent-formulation live set (wy_mat + wx_mat + rows, f32, x3
    HIGHEST-precision scratch) fits ~4 MB. Shared with _pick_block_rows so
    the feasibility estimate can never drift from the kernel's actual
    chunking."""
    rows_per = bi
    while (rows_per * wo) * (h_in + 2 * w_in) * 4 * 3 > 4 * 1024 * 1024 \
            and rows_per % 2 == 0:
        rows_per //= 2
    return rows_per


def _pick_block_rows(ho, h_in, w_in, wo, vmem_budget=10 * 1024 * 1024):
    """Output row-block height. Mosaic's tiling requires the output block's
    sublane dim to be a multiple of 8 (or the whole axis), so only 16/8 (or
    ho itself) are candidates; prefer the larger whose one-hot matrices fit
    the scoped-VMEM budget.

    The estimate is the SUM over the kernel's row chunks (= the un-chunked
    block size), NOT one chunk's live set: the chunk loop is a Python
    unroll and Mosaic does not reuse stack allocations across unrolled
    iterations. Measured on v5e (16 MB scoped-VMEM limit) at 352x352:
    bi=16 allocates 19.3 MB and bi=8 16.29 MB — both over the limit, so
    the 352 training-augmentation warp (1.1x crop of 320) correctly takes
    the XLA fallback; 320x320 at bi=8 (9.8 MB) compiles. The 10 MB budget
    models the limit minus band/input/reflection residents (~4.4 MB)."""
    for bi in (16, 8):
        if ho % bi:
            continue
        p = bi * wo
        need = 4 * (p * h_in + 2 * p * w_in)
        if need < vmem_budget:
            return bi
    p = ho * wo
    if 4 * (p * h_in + 2 * p * w_in) < vmem_budget:
        return ho
    return None


def grid_sample_pallas(img, grid, padding_mode="zeros", interpret=None):
    """Bilinear grid sample [N,C,H,W] x [N,Ho,Wo,2] -> [N,C,Ho,Wo].

    Differentiable wrt both inputs (custom VJP). interpret=None auto-enables
    the Pallas interpreter off-TPU (tests); real TPUs compile via Mosaic.
    """
    if interpret is None:
        interpret = jax.default_backend() not in ("tpu", "axon")
    return _grid_sample_pallas(img, grid, padding_mode, bool(interpret))


@functools.partial(jax.custom_vjp, nondiff_argnums=(2, 3))
def _grid_sample_pallas(img, grid, padding_mode, interpret):
    return _forward(img, grid, padding_mode, interpret)


def _forward(img, grid, padding_mode, interpret):
    n, c, h, w = img.shape
    _, ho, wo, _ = grid.shape
    assert grid.shape[0] == n and grid.shape[3] == 2
    bi = _pick_block_rows(ho, h, w, wo)
    if bi is None:
        # no VMEM-feasible tiling (e.g. large non-multiple-of-8 heights):
        # use the gather formulation instead of hanging/OOMing the chip
        from ..grid_sample import grid_sample as ref_sample

        return ref_sample(img, grid, padding_mode, impl="jnp")
    n_blocks = ho // bi

    band = min(64, h)  # source-row band height for the fast path
    kernel = functools.partial(
        _kernel, h_in=h, w_in=w, bi=bi, padding_mode=padding_mode, band=band
    )
    return pl.pallas_call(
        kernel,
        grid=(n, c, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, h, w), lambda i, j, k: (i, j, 0, 0)),
            pl.BlockSpec((1, bi, wo, 2), lambda i, j, k: (i, k, 0, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, bi, wo), lambda i, j, k: (i, j, k, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c, ho, wo), img.dtype),
        interpret=interpret,
    )(img, grid)


def _fwd(img, grid, padding_mode, interpret):
    return _forward(img, grid, padding_mode, interpret), (img, grid)


# --------------------------------------------------------------- backward
# The backward pass is the TRANSPOSED one-hot contraction — the same MXU
# trick as the forward, so training (the dominant workload) never falls
# back to XLA's scalar-core scatter-add (reference cross.py:33-34 has a
# native fwd+bwd CUDA sampler; this is the TPU equivalent):
#
#   d_img[y, x] = sum_p Wy[p, y] * g[p] * Wx[p, x]     (Wy^T @ (g .* Wx))
#   d_ix[p]     = g[p] * sum_x (Wy @ img)[p, x] * dWx[p, x]
#   d_iy[p]     = g[p] * sum_x (dWy @ img)[p, x] * Wx[p, x]
#
# where dW is the derivative of the bilinear weight wrt the (padded) pixel
# coordinate in the exact floor-based form the jnp reference differentiates
# to: -1 at floor(coord), +1 at floor(coord)+1, 0 elsewhere (floor itself
# has zero gradient). The padding-mode transform (clip/reflect) and the
# [-1,1]->pixel unnormalization are chained OUTSIDE the kernel with
# jax.vjp, so clamp masking matches the jnp formulation exactly.


def _tent(coord_iota, c):
    return jnp.maximum(1.0 - jnp.abs(coord_iota - c), 0.0)


def _dtent(coord_iota, c):
    """d/dc max(1 - |i - c|, 0) in floor form: -1 at floor(c), +1 at
    floor(c)+1 (matches d/dc of (1-frac, frac) tap weights)."""
    c0 = jnp.floor(c)
    return jnp.where(coord_iota == c0, -1.0, 0.0) + jnp.where(
        coord_iota == c0 + 1.0, 1.0, 0.0
    )


def _bwd_rows_per(bi, wo, h_in, w_in, words_per_p):
    """Chunk height for the backward contractions: always 1. Mosaic's
    layout inference only supports the [rows, wo] -> [rows*wo, 1] flatten
    when rows == 1 (a relayout, not a true collapse). A halving loop used
    here previously could return an odd rows > 1 (e.g. bi=20 -> 5), which
    interpret-mode tests accept but real Mosaic compilation rejects."""
    del bi, wo, h_in, w_in, words_per_p
    return 1


def _band_range(iy_block, h_in, band):
    """Source-row band covering all taps of a block (see forward kernel).
    Works on the [bi, wo] block directly: min/max need no flatten (the
    [bi*wo, 1] collapse is unsupported by Mosaic layout inference)."""
    y0i = jnp.floor(iy_block).astype(jnp.int32)
    t0 = jnp.clip(y0i, 0, h_in - 1)
    t1 = jnp.clip(y0i + 1, 0, h_in - 1)
    band_start = jnp.clip(jnp.min(t0), 0, max(h_in - band, 0))
    band_start = pl.multiple_of((band_start // 8) * 8, 8)
    fits = jnp.max(t1) + 1 - band_start <= band
    return band_start, fits


def _kernel_dimg(ix_ref, iy_ref, g_ref, out_ref, *, h_in, w_in, bi, band):
    """Accumulate one g-block's contribution into the [h, w] plane.

    Grid (n, c, n_blocks) with the block dim innermost: the same out block
    stays resident while k sweeps the output rows, so accumulation is a
    VMEM read-modify-write initialized at k == 0. The banded fast path
    contracts only the source-row band the block's taps touch (smooth
    displacement fields), falling back to the full [pc, h] contraction.
    """
    wo = g_ref.shape[-1]
    rows_per = _bwd_rows_per(bi, wo, h_in, w_in, h_in + 2 * w_in)
    pc = rows_per * wo
    # load whole blocks, slice in-register along the leading axis (the only
    # static-slice pattern Mosaic's layout inference supports here)
    iy = iy_ref[0].astype(jnp.float32)   # [bi, wo]
    ix = ix_ref[0].astype(jnp.float32)
    gg = g_ref[0, 0].astype(jnp.float32)
    band_start, fits = _band_range(iy, h_in, band)

    @pl.when(pl.program_id(2) == 0)
    def _():
        out_ref[...] = jnp.zeros(out_ref.shape, out_ref.dtype)

    def run(n_rows, y_offset):
        acc = jnp.zeros((n_rows, w_in), jnp.float32)
        for ci in range(bi // rows_per):
            r0 = ci * rows_per
            iy_c = iy[r0:r0 + rows_per].reshape(pc, 1)
            ix_c = ix[r0:r0 + rows_per].reshape(pc, 1)
            g_c = gg[r0:r0 + rows_per].reshape(pc, 1)
            ys = (
                jax.lax.broadcasted_iota(jnp.int32, (pc, n_rows), 1)
                + y_offset
            ).astype(jnp.float32)
            wy = _tent(ys, iy_c)
            xs = jax.lax.broadcasted_iota(jnp.int32, (pc, w_in), 1).astype(
                jnp.float32
            )
            t = _tent(xs, ix_c) * g_c
            # contract over p: [pc, rows]^T @ [pc, w] -> [rows, w]
            acc += jax.lax.dot_general(
                wy, t, (((0,), (0,)), ((), ())),
                preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
        return acc

    @pl.when(fits)
    def _():
        out_ref[0, 0, pl.ds(band_start, band), :] += run(
            band, band_start
        ).astype(out_ref.dtype)

    @pl.when(jnp.logical_not(fits))
    def _():
        out_ref[0, 0] += run(h_in, 0).astype(out_ref.dtype)


def _kernel_dgrid(img_ref, ix_ref, iy_ref, g_ref, dix_ref, diy_ref, *,
                  h_in, w_in, bi, band):
    """d wrt the padded pixel coords for one output block, summed over the
    channel dim (grid (n, n_blocks, c), channels innermost -> accumulate).
    Banded like the forward: both tent and tent-derivative taps live in
    the same source-row band."""
    wo = g_ref.shape[-1]
    rows_per = _bwd_rows_per(bi, wo, h_in, w_in, 2 * h_in + 4 * w_in)
    pc = rows_per * wo
    iy = iy_ref[0].astype(jnp.float32)   # [bi, wo]
    ix = ix_ref[0].astype(jnp.float32)
    gg = g_ref[0, 0].astype(jnp.float32)
    band_start, fits = _band_range(iy, h_in, band)

    @pl.when(pl.program_id(2) == 0)
    def _():
        dix_ref[...] = jnp.zeros(dix_ref.shape, dix_ref.dtype)
        diy_ref[...] = jnp.zeros(diy_ref.shape, diy_ref.dtype)

    def run(src_rows, y_offset):
        n_src = src_rows.shape[0]
        src = src_rows.astype(jnp.float32)
        for ci in range(bi // rows_per):
            r0 = ci * rows_per
            iy_c = iy[r0:r0 + rows_per].reshape(pc, 1)
            ix_c = ix[r0:r0 + rows_per].reshape(pc, 1)
            g_c = gg[r0:r0 + rows_per].reshape(pc, 1)
            ys = (
                jax.lax.broadcasted_iota(jnp.int32, (pc, n_src), 1)
                + y_offset
            ).astype(jnp.float32)
            xs = jax.lax.broadcasted_iota(jnp.int32, (pc, w_in), 1).astype(
                jnp.float32
            )
            wx = _tent(xs, ix_c)
            dwx = _dtent(xs, ix_c)
            mm = lambda a: jnp.dot(
                a, src, preferred_element_type=jnp.float32,
                precision=jax.lax.Precision.HIGHEST,
            )
            rows = mm(_tent(ys, iy_c))      # [pc, w]
            rows_d = mm(_dtent(ys, iy_c))   # [pc, w]
            dix = jnp.sum(rows * dwx, axis=1, keepdims=True) * g_c
            diy = jnp.sum(rows_d * wx, axis=1, keepdims=True) * g_c
            dix_ref[0, r0:r0 + rows_per, :] += dix.reshape(
                rows_per, wo
            ).astype(dix_ref.dtype)
            diy_ref[0, r0:r0 + rows_per, :] += diy.reshape(
                rows_per, wo
            ).astype(diy_ref.dtype)

    @pl.when(fits)
    def _():
        run(img_ref[0, 0, pl.ds(band_start, band), :], band_start)

    @pl.when(jnp.logical_not(fits))
    def _():
        run(img_ref[0, 0], 0)


def _bwd(padding_mode, interpret, res, g):
    img, grid = res
    n, c, h, w = img.shape
    _, ho, wo, _ = grid.shape
    bi = _pick_block_rows(ho, h, w, wo)
    if bi is None:
        # mirror the forward's fallback: no VMEM-feasible tiling
        from ..grid_sample import grid_sample as ref_sample

        _, vjp = jax.vjp(
            lambda i, gr: ref_sample(i, gr, padding_mode, impl="jnp"),
            img, grid,
        )
        return vjp(g)
    n_blocks = ho // bi

    def coords(grid):
        gx = grid[..., 0].astype(jnp.float32)
        gy = grid[..., 1].astype(jnp.float32)
        ix = _apply_padding(((gx + 1.0) * w - 1.0) / 2.0, w, padding_mode)
        iy = _apply_padding(((gy + 1.0) * h - 1.0) / 2.0, h, padding_mode)
        return ix, iy

    (ix, iy), coords_vjp = jax.vjp(coords, grid)

    band = min(64, h)
    d_img = pl.pallas_call(
        functools.partial(_kernel_dimg, h_in=h, w_in=w, bi=bi, band=band),
        grid=(n, c, n_blocks),
        in_specs=[
            pl.BlockSpec((1, bi, wo), lambda i, j, k: (i, k, 0)),
            pl.BlockSpec((1, bi, wo), lambda i, j, k: (i, k, 0)),
            pl.BlockSpec((1, 1, bi, wo), lambda i, j, k: (i, j, k, 0)),
        ],
        out_specs=pl.BlockSpec((1, 1, h, w), lambda i, j, k: (i, j, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((n, c, h, w), jnp.float32),
        interpret=interpret,
    )(ix, iy, g).astype(img.dtype)

    d_ix, d_iy = pl.pallas_call(
        functools.partial(_kernel_dgrid, h_in=h, w_in=w, bi=bi, band=band),
        grid=(n, n_blocks, c),
        in_specs=[
            pl.BlockSpec((1, 1, h, w), lambda i, k, j: (i, j, 0, 0)),
            pl.BlockSpec((1, bi, wo), lambda i, k, j: (i, k, 0)),
            pl.BlockSpec((1, bi, wo), lambda i, k, j: (i, k, 0)),
            pl.BlockSpec((1, 1, bi, wo), lambda i, k, j: (i, j, k, 0)),
        ],
        out_specs=[
            pl.BlockSpec((1, bi, wo), lambda i, k, j: (i, k, 0)),
            pl.BlockSpec((1, bi, wo), lambda i, k, j: (i, k, 0)),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((n, ho, wo), jnp.float32),
            jax.ShapeDtypeStruct((n, ho, wo), jnp.float32),
        ],
        interpret=interpret,
    )(img, ix, iy, g)

    (d_grid,) = coords_vjp((d_ix, d_iy))
    return d_img, d_grid


_grid_sample_pallas.defvjp(_fwd, _bwd)
