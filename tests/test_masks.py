"""Property tests for k-space mask generators (conventions per masks.py)."""

import math

import numpy as np
import jax
import jax.numpy as jnp

from spatialalignmentnetwork_tpu.ops import masks as M


SHAPE = 320


def _acs_indices(center_len, shape):
    half = center_len // 2
    return list(range(half)) + list(range(shape - (center_len - half), shape))


def test_standard_mask_sparsity_and_acs():
    for sparsity in (0.25, 0.125):
        pruned = M.standard_mask(sparsity, SHAPE, np.random.default_rng(0))
        kept = (~pruned).sum()
        assert kept == math.floor(sparsity * SHAPE)
        center_len = M.center_len_for(sparsity, SHAPE)
        for i in _acs_indices(center_len, SHAPE):
            assert not pruned[i], f"ACS line {i} pruned"


def test_equispaced_mask_sparsity_acs_and_spacing():
    for sparsity in (0.25, 0.125):
        pruned = M.equispaced_mask(sparsity, SHAPE, np.random.default_rng(1))
        center_len = M.center_len_for(sparsity, SHAPE)
        for i in _acs_indices(center_len, SHAPE):
            assert not pruned[i]
        kept = (~pruned).sum()
        # center + equispaced comb
        assert kept == center_len + math.floor(sparsity * SHAPE - center_len)
        # non-center kept lines are equispaced
        sl = slice(center_len // 2, center_len // 2 - center_len)
        idx = np.where(~pruned[sl])[0]
        gaps = np.diff(np.sort(idx))
        # all gaps equal except possibly one wrap discontinuity
        vals, counts = np.unique(gaps, return_counts=True)
        assert len(vals) <= 2


def test_lowpass_mask():
    pruned = M.lowpass_mask(0.25, SHAPE)
    center_len = math.floor(SHAPE * 0.25)
    assert (~pruned).sum() == center_len
    for i in _acs_indices(center_len, SHAPE):
        assert not pruned[i]


def test_loupe_mask_sparsity():
    st = M.make_mask("loupe", SHAPE, sparsity=0.25, seed=3)
    kept = (~st.pruned).sum()
    assert kept == int(0.25 * SHAPE + 0.5)
    # soft training sample stays within (0, 1) and is differentiable
    key = jax.random.PRNGKey(0)
    mask, _ = M.loupe_sample(
        jnp.asarray(st.weight), 0.25, st.pmask_slope, st.sample_slope,
        key, batch=2, training=True,
    )
    assert mask.shape == (2, SHAPE)
    assert float(mask.min()) > 0.0 and float(mask.max()) < 1.0

    def loss(w):
        m, _ = M.loupe_sample(w, 0.25, st.pmask_slope, st.sample_slope,
                              key, batch=1, training=True)
        return jnp.sum(m**2)

    g = jax.grad(loss)(jnp.asarray(st.weight))
    assert np.isfinite(np.asarray(g)).all() and np.abs(np.asarray(g)).sum() > 0


def test_magnitude_prune():
    w = np.array([0.5, 0.1, 0.9, 0.05, 2.0], dtype=np.float32)
    pruned = np.zeros(5, dtype=bool)
    out = M.magnitude_prune(w, pruned, num=2)
    # two smallest |w| under thres=1 pruned: indices 3 (0.05) and 1 (0.1)
    assert out.tolist() == [False, True, False, True, False]
    # w=2.0 never pruned (>= thres)
    out2 = M.magnitude_prune(w, out, num=5)
    assert not out2[4]


def test_apply_mask():
    st = M.make_mask("equispaced", 16, sparsity=0.5, seed=0)
    k = jnp.ones((1, 1, 4, 16), dtype=jnp.complex64)
    out = np.asarray(M.apply_mask(k, jnp.asarray(st.pruned)))
    np.testing.assert_array_equal(out[0, 0, 0].real == 0, st.pruned)


def test_make_mask_registry():
    for kind in M.MASK_KINDS:
        st = M.make_mask(kind, 64, sparsity=0.25, seed=0)
        assert st.pruned.shape == (64,)
