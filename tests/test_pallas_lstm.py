"""Parity tests for the fused Pallas LSTM cell (ops/pallas_lstm.py) against
the reference jnp cell (layers.lstm_cell): forward values and full
gradients, run in Pallas interpret mode on CPU."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

from simpleimagecaptionzoo_tpu.models import layers as L
from simpleimagecaptionzoo_tpu.ops import pallas_lstm

B, E, H = 16, 384, 128


@pytest.fixture()
def cell_inputs(rng):
    params = L.lstm_cell_init(jax.random.PRNGKey(0), E, H)
    x = jnp.asarray(rng.normal(size=(B, E)), jnp.float32)
    h = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    return params, x, h, c


def test_forward_parity(cell_inputs):
    params, x, h, c = cell_inputs
    h_ref, c_ref = L.lstm_cell(params, x, h, c)
    h_pl, c_pl = pallas_lstm.lstm_cell_fused(params, x, h, c, interpret=True)
    np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_pl), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-5)


def test_forward_parity_unaligned_k(rng):
    """K = E + H not a multiple of the K-tile -> zero-padding path."""
    e = 200
    params = L.lstm_cell_init(jax.random.PRNGKey(1), e, H)
    x = jnp.asarray(rng.normal(size=(B, e)), jnp.float32)
    h = jnp.asarray(rng.normal(size=(B, H)), jnp.float32)
    c = jnp.zeros((B, H), jnp.float32)
    h_ref, c_ref = L.lstm_cell(params, x, h, c)
    h_pl, c_pl = pallas_lstm.lstm_cell_fused(params, x, h, c, interpret=True)
    np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_pl), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-5)


def test_gradient_parity(cell_inputs):
    params, x, h, c = cell_inputs

    def loss_ref(p, x, h, c):
        hn, cn = L.lstm_cell(p, x, h, c)
        return jnp.sum(hn * 1.3 + cn * 0.7)

    def loss_pl(p, x, h, c):
        hn, cn = pallas_lstm.lstm_cell_fused(p, x, h, c, interpret=True)
        return jnp.sum(hn * 1.3 + cn * 0.7)

    g_ref = jax.grad(loss_ref, argnums=(0, 1, 2, 3))(params, x, h, c)
    g_pl = jax.grad(loss_pl, argnums=(0, 1, 2, 3))(params, x, h, c)
    for a, b in zip(jax.tree_util.tree_leaves(g_ref),
                    jax.tree_util.tree_leaves(g_pl)):
        np.testing.assert_allclose(np.asarray(b), np.asarray(a),
                                   rtol=1e-4, atol=1e-4)


def test_supported_gate():
    assert pallas_lstm._supported(100, 128, 16)
    assert not pallas_lstm._supported(100, 100, 16)   # H % 128 != 0
    assert not pallas_lstm._supported(100, 128, 3)    # B % 8 != 0


def test_supported_sizes_by_promoted_dtype(monkeypatch):
    """VMEM gate must size tiles by the widest of x/h/params dtypes: a bf16
    x with f32 h/params runs the kernel in f32, and sizing by x alone
    undercounts VMEM 2x (Mosaic compile failure instead of jnp fallback).
    Tiled plans give the finest sizing granularity, so opt in for the
    batch sweep below to find a separating shape."""
    monkeypatch.setenv("SICZ_TPU_PALLAS_LSTM_TILED", "auto")
    import jax.numpy as jnp

    from simpleimagecaptionzoo_tpu.models.layers import lstm_cell_init
    from simpleimagecaptionzoo_tpu.ops import pallas_lstm as PL

    params = lstm_cell_init(jax.random.PRNGKey(0), 1024, 1024)  # f32
    # pick a batch where the f32 estimate exceeds the budget but the
    # (wrong) bf16-sized estimate would fit
    for b in (256, 512, 1024, 2048):
        f32_fits = PL._supported(1024, 1024, b, itemsize=4)
        bf16_fits = PL._supported(1024, 1024, b, itemsize=2)
        if bf16_fits and not f32_fits:
            x16 = jnp.zeros((b, 1024), jnp.bfloat16)
            h32 = jnp.zeros((b, 1024), jnp.float32)
            assert not PL.supported(params, x16, h32), \
                "mixed bf16/f32 must be gated by the promoted (f32) size"
            break
    else:
        raise AssertionError("no batch separates the two estimates; "
                             "update the test shapes")


def test_kernel_mode_normalization(monkeypatch):
    from simpleimagecaptionzoo_tpu.ops.dispatch import kernel_mode
    for v in ("OFF", "Off", "0", "false", "no", " off "):
        monkeypatch.setenv("SICZ_TEST_MODE", v)
        assert kernel_mode("SICZ_TEST_MODE") == "off", v
    monkeypatch.setenv("SICZ_TEST_MODE", "INTERPRET")
    assert kernel_mode("SICZ_TEST_MODE") == "interpret"
    monkeypatch.setenv("SICZ_TEST_MODE", "bogus-value")
    import warnings
    with warnings.catch_warnings(record=True) as w:
        warnings.simplefilter("always")
        assert kernel_mode("SICZ_TEST_MODE") == "auto"
    monkeypatch.delenv("SICZ_TEST_MODE")
    assert kernel_mode("SICZ_TEST_MODE", default="off") == "off"


def test_forward_and_grad_parity_hidden_tiled(rng, monkeypatch):
    """B large enough that _plan_h_tile picks Ht < H (the round-4
    hidden-tiled kernel: per-gate BlockSpec views over one (K, 4H)
    weight array).  Forward AND gradient parity at a forced-tiled
    shape.  Tiled plans are opt-in (measured slower than XLA at the
    flagship shape), so the test sets the env toggle."""
    monkeypatch.setenv("SICZ_TPU_PALLAS_LSTM_TILED", "auto")
    b, e, hid = 32, 256, 256
    # force tiling regardless of the VMEM plan by checking the plan on
    # the REAL flagship shape separately (below) and exercising the
    # tiled code path here via a monkeypatch-free route: shrink the
    # budget through the planner by asserting on whichever Ht it picks,
    # then checking parity holds for a second, explicitly tiled call.
    params = L.lstm_cell_init(jax.random.PRNGKey(1), e, hid)
    x = jnp.asarray(rng.normal(size=(b, e)), jnp.float32)
    h = jnp.asarray(rng.normal(size=(b, hid)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(b, hid)), jnp.float32)

    budget = pallas_lstm._VMEM_BUDGET
    try:
        # squeeze the budget so the planner must tile hid into >=2 tiles
        pallas_lstm._VMEM_BUDGET = 1600 * 1024
        ht = pallas_lstm._plan_h_tile(e, hid, b, 4)
        assert ht is not None and ht < hid, f"plan gave Ht={ht}"
        h_pl, c_pl = pallas_lstm.lstm_cell_fused(params, x, h, c,
                                                 interpret=True)
    finally:
        pallas_lstm._VMEM_BUDGET = budget
    h_ref, c_ref = L.lstm_cell(params, x, h, c)
    np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_ref),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(c_pl), np.asarray(c_ref),
                               rtol=1e-5, atol=1e-5)

    # gradients flow through the custom VJP identically regardless of
    # the forward tiling (backward recomputes in jnp)
    def loss_pl(p):
        hn, cn = pallas_lstm.lstm_cell_fused(p, x, h, c, interpret=True)
        return jnp.sum(hn * cn)

    def loss_ref(p):
        hn, cn = L.lstm_cell(p, x, h, c)
        return jnp.sum(hn * cn)

    try:
        pallas_lstm._VMEM_BUDGET = 1600 * 1024
        g_pl = jax.grad(loss_pl)(params)
    finally:
        pallas_lstm._VMEM_BUDGET = budget
    g_ref = jax.grad(loss_ref)(params)
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_pl[k]), np.asarray(g_ref[k]),
                                   rtol=1e-4, atol=1e-4)


def test_forward_and_grad_parity_gate_tiled(rng, monkeypatch):
    """Round-4 GATE-TILED kernel (grid over hidden-tile x gate x K-tile,
    xh resident, single full-width dot per step, i->g->f->o single-stash
    epilogue): forward + gradient parity, at both hs == H and a
    budget-forced hs < H."""
    monkeypatch.setenv("SICZ_TPU_PALLAS_LSTM_GATE", "auto")
    from simpleimagecaptionzoo_tpu.ops import pallas_lstm as PL
    b, e, hid = 16, 384, 256
    params = L.lstm_cell_init(jax.random.PRNGKey(2), e, hid)
    x = jnp.asarray(rng.normal(size=(b, e)), jnp.float32)
    h = jnp.asarray(rng.normal(size=(b, hid)), jnp.float32)
    c = jnp.asarray(rng.normal(size=(b, hid)), jnp.float32)
    h_ref, c_ref = L.lstm_cell(params, x, h, c)

    budget = PL._VMEM_BUDGET
    try:
        for bud, want_sub in ((1400 * 1024, False), (500 * 1024, True)):
            PL._VMEM_BUDGET = bud
            # whole-row must NOT fit so dispatch reaches the gate plan
            assert PL._plan_h_tile(e, hid, b, 4, allow_tiled=False) is None
            hs = PL._plan_gate_tile(e, hid, b, 4)
            assert hs is not None, bud
            if want_sub:
                assert hs < hid, hs
            h_pl, c_pl = PL.lstm_cell_fused(params, x, h, c, interpret=True)
            np.testing.assert_allclose(np.asarray(h_pl), np.asarray(h_ref),
                                       rtol=1e-5, atol=1e-5)
            np.testing.assert_allclose(np.asarray(c_pl), np.asarray(c_ref),
                                       rtol=1e-5, atol=1e-5)

        PL._VMEM_BUDGET = 500 * 1024

        def loss_pl(p):
            hn, cn = PL.lstm_cell_fused(p, x, h, c, interpret=True)
            return jnp.sum(hn * cn)

        g_pl = jax.grad(loss_pl)(params)
    finally:
        PL._VMEM_BUDGET = budget

    def loss_ref(p):
        hn, cn = L.lstm_cell(p, x, h, c)
        return jnp.sum(hn * cn)

    g_ref = jax.grad(loss_ref)(params)
    for k in g_ref:
        np.testing.assert_allclose(np.asarray(g_pl[k]), np.asarray(g_ref[k]),
                                   rtol=1e-4, atol=1e-4)


def test_gate_tiled_plan_flagship_shape(monkeypatch):
    """At the flagship beam cell shape (B=768 bf16, K=3072, H=1024) the
    whole-row plan cannot fit but the gate-tiled plan must (its biggest
    block is the resident xh, and acc/stash are (B, Hs) not (B, 4H)) —
    and it stays opt-in until measurement says otherwise."""
    monkeypatch.delenv("SICZ_TPU_PALLAS_LSTM_GATE", raising=False)
    from simpleimagecaptionzoo_tpu.ops import pallas_lstm as PL
    assert PL._plan_h_tile(3072, 1024, 768, 2, allow_tiled=False) is None
    assert PL._plan_gate_tile(3072, 1024, 768, 2) is None      # opt-in
    hs = PL._plan_gate_tile(3072, 1024, 768, 2, allow_gate=True)
    assert hs is not None and 1024 % hs == 0


def test_flagship_beam_shape_tiled_plan_is_opt_in(monkeypatch):
    """B=768 (256x3 beam lanes) at the production cell shape: the
    hidden-tiled plan COMPILES there, but the 2026-08-19 on-chip A/B
    measured it slower than XLA (0.81x f32 / 0.94x bf16), so by default
    the planner must keep the round-3 self-disable and only engage the
    tiled layout under the explicit opt-in."""
    monkeypatch.delenv("SICZ_TPU_PALLAS_LSTM_TILED", raising=False)
    assert pallas_lstm._plan_h_tile(3072, 1024, 768, 2) is None
    assert pallas_lstm._plan_h_tile(3072, 1024, 1152, 2) is None
    assert pallas_lstm._plan_h_tile(
        3072, 1024, 768, 2, allow_tiled=True) is not None
    assert pallas_lstm._plan_h_tile(
        3072, 1024, 1152, 2, allow_tiled=True) is not None
    monkeypatch.setenv("SICZ_TPU_PALLAS_LSTM_TILED", "auto")
    assert pallas_lstm._plan_h_tile(3072, 1024, 768, 2) is not None


def test_gate_col_matches_gate_col_constant():
    """_gate_col (the traced permutation used by the gate-tiled kernel's
    BlockSpec index maps) must equal the documented _GATE_COL processing
    order — they were separate implementations that could silently
    diverge (ADVICE r4 #2)."""
    got = tuple(int(pallas_lstm._gate_col(jnp.int32(n))) for n in range(4))
    assert got == pallas_lstm._GATE_COL
