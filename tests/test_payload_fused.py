"""kernels.payload_fused (fused FFT+equalize+demap Pallas tail) must
reproduce the XLA payload tail: interpret-mode kernel vs the reference
chain, plus the decode-level dispatch equality."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from rub_mimo_tpu.config import ModemConfig, Modulation
from rub_mimo_tpu.io import simulator
from rub_mimo_tpu.kernels.payload_fused import payload_fused, supported
from rub_mimo_tpu.ofdm import constellation
from rub_mimo_tpu.pipeline import rx


def _reference_tail(x, W, gain, modulation, norm):
    from rub_mimo_tpu.detect import zf

    S, n_sym, M = x.shape
    X = jnp.fft.fft(x, axis=-1) * norm
    Y = jnp.moveaxis(X, 1, 0)
    eq = zf.equalize(Y, W, gain)
    rx_sig = jnp.moveaxis(eq, 0, 1).reshape(S, n_sym * M)
    return rx_sig, constellation.demodulate(rx_sig, modulation)


@pytest.mark.parametrize("n_sym", [8, 37])
def test_kernel_matches_xla_tail(n_sym):
    rng = np.random.default_rng(3)
    S, M = 2, 2048
    x = jnp.asarray(
        (rng.normal(size=(S, n_sym, M)) * 0.3
         + 1j * rng.normal(size=(S, n_sym, M)) * 0.3).astype(np.complex64))
    W = jnp.asarray(
        (rng.normal(size=(M, S, S))
         + 1j * rng.normal(size=(M, S, S))).astype(np.complex64))
    gain = jnp.asarray(rng.normal(size=(M,)).astype(np.float32))
    tab = np.asarray(constellation.table(Modulation.ARB32OPT))
    norm = np.float32(1.0 / np.sqrt(M))

    sig, data = payload_fused(x, W, gain, tab, norm, interpret=True)
    ref_sig, ref_data = _reference_tail(x, W, gain, Modulation.ARB32OPT,
                                        norm)
    # same math, different summation order: fp-close, decisions may
    # differ only on exact Voronoi boundaries (none with this seed)
    np.testing.assert_allclose(np.asarray(sig), np.asarray(ref_sig),
                               rtol=0, atol=5e-5)
    assert int(jnp.sum(data != ref_data)) == 0


def test_supported_gate():
    assert supported(2048, 2048, 2, 32)
    assert supported(1024, 1024, 2, 32)
    assert not supported(2048, 1842, 2, 32)   # guard-band allocation
    assert not supported(64, 64, 2, 32)       # M too small
    assert not supported(2048, 2048, 2, 256)  # arity too large


def test_decode_dispatch_equality():
    cfg = ModemConfig(pid_max=12, bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=30.0, delay=3000, seed=7)
    capture, tx_data, _ = simulator.simulate_capture(cfg, spec)
    r_xla = rx.decode(jnp.asarray(capture), cfg, payload_impl="xla")
    r_fus = rx.decode(jnp.asarray(capture), cfg, payload_impl="fused")
    assert bool(r_xla.synced) and bool(r_fus.synced)
    assert int(jnp.sum(r_xla.rx_data != r_fus.rx_data)) == 0
    np.testing.assert_allclose(np.asarray(r_fus.rx_sig),
                               np.asarray(r_xla.rx_sig), rtol=0, atol=5e-5)
    # and the fused path actually decodes the payload
    n = cfg.pid_max * cfg.M_occupied
    errs = int(np.sum(np.asarray(r_fus.rx_data)[:, :n]
                      != np.asarray(tx_data)[:, :n]))
    assert errs == 0


def test_unsupported_geometry_falls_back():
    # guard-band preset: gate rejects, decode must still work via xla
    cfg = ModemConfig(pid_max=6, bit_exact=False, use_all_carriers=False)
    spec = simulator.ChannelSpec(snr_db=30.0, delay=2000, seed=9)
    capture, tx_data, _ = simulator.simulate_capture(cfg, spec)
    r = rx.decode(jnp.asarray(capture), cfg, payload_impl="fused")
    assert bool(r.synced)
    n = cfg.pid_max * cfg.M_occupied
    errs = int(np.sum(np.asarray(r.rx_data)[:, :n]
                      != np.asarray(tx_data)[:, :n]))
    assert errs == 0


@pytest.mark.parametrize("n_sym", [8, 37])
def test_packed_kernel_matches_natural_through_perm(n_sym):
    from rub_mimo_tpu.kernels.payload_fused import packed_perm

    rng = np.random.default_rng(4)
    S, M = 2, 2048
    x = jnp.asarray(
        (rng.normal(size=(S, n_sym, M)) * 0.3
         + 1j * rng.normal(size=(S, n_sym, M)) * 0.3).astype(np.complex64))
    W = jnp.asarray(
        (rng.normal(size=(M, S, S))
         + 1j * rng.normal(size=(M, S, S))).astype(np.complex64))
    gain = jnp.asarray(rng.normal(size=(M,)).astype(np.float32))
    tab = np.asarray(constellation.table(Modulation.ARB32OPT))
    norm = np.float32(1.0 / np.sqrt(M))

    sig_n, data_n = payload_fused(x, W, gain, tab, norm, interpret=True)
    sig_p, data_p = payload_fused(x, W, gain, tab, norm, interpret=True,
                                  packed=True)
    perm = packed_perm(M)
    # natural = packed[..., perm] per frame; the packed kernel computes
    # the SAME values, so this must be exact (not fp-close)
    for nat, pk in ((data_n, data_p), (sig_n, sig_p)):
        nat = np.asarray(nat).reshape(S, n_sym, M)
        pk = np.asarray(pk).reshape(S, n_sym, M)[:, :, perm]
        np.testing.assert_array_equal(nat, pk)


def test_decode_fused_packed_and_report_scoring():
    """decode(payload_impl='fused_packed') sets payload_perm and the
    scoring path (report.score) transparently un-permutes: SER 0 and
    EVM matching the natural-order decode."""
    from rub_mimo_tpu.pipeline import report

    cfg = ModemConfig(pid_max=12, bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=30.0, delay=3000, seed=7)
    capture, tx_data, _ = simulator.simulate_capture(cfg, spec)
    r_xla = rx.decode(jnp.asarray(capture), cfg, payload_impl="xla")
    r_pk = rx.decode(jnp.asarray(capture), cfg,
                     payload_impl="fused_packed")
    assert r_pk.payload_perm is not None
    assert r_xla.payload_perm is None
    perm = np.asarray(r_pk.payload_perm)
    m = cfg.M_occupied
    rxd = np.asarray(r_pk.rx_data).reshape(cfg.num_streams, -1, m)
    rxd = rxd[:, :, perm].reshape(cfg.num_streams, -1)
    assert int(np.sum(rxd != np.asarray(r_xla.rx_data))) == 0

    rep = report.score(r_pk, tx_data, cfg)
    assert rep.symbol_error_rate == [0.0, 0.0]
    rep_ref = report.score(r_xla, tx_data, cfg)
    np.testing.assert_allclose(rep.evm_percent, rep_ref.evm_percent,
                               rtol=1e-3)


def test_auto_never_selects_fused_packed():
    from rub_mimo_tpu.utils import impl_select

    impl_select.best_impl.cache_clear()
    for backend in ("tpu", "cpu"):
        assert impl_select.best_impl("payload", backend) != "fused_packed"


def test_decode_dispatch_equality_eqdemap():
    cfg = ModemConfig(pid_max=12, bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=30.0, delay=3000, seed=7)
    capture, tx_data, _ = simulator.simulate_capture(cfg, spec)
    r_xla = rx.decode(jnp.asarray(capture), cfg, payload_impl="xla")
    r_eqd = rx.decode(jnp.asarray(capture), cfg, payload_impl="eqdemap")
    assert bool(r_eqd.synced)
    assert int(jnp.sum(r_xla.rx_data != r_eqd.rx_data)) == 0
    np.testing.assert_allclose(np.asarray(r_eqd.rx_sig),
                               np.asarray(r_xla.rx_sig), rtol=0, atol=5e-6)


def test_payload_fused_strip_matches_packed():
    """The strip-fused kernel (CP strip + FFT + eq + demap in one
    kernel, flat-payload input) produces the packed kernel's decisions
    across tail geometries: n_sym below / at / past the supergroup
    size (G=16 at symbol_len=2200)."""
    from rub_mimo_tpu.kernels.payload_fused import (
        payload_fused, payload_fused_strip)

    rng = np.random.RandomState(3)
    S, M, sym, cp = 2, 2048, 2200, 152
    W = jnp.asarray((rng.randn(M, S, S)
                     + 1j * rng.randn(M, S, S)).astype(np.complex64))
    gain = jnp.asarray(rng.randn(M).astype(np.float32))
    tab = np.asarray(constellation.table(Modulation.ARB32OPT))
    norm = np.float32(1.0 / np.sqrt(M))
    for n_sym in (12, 16, 28):
        flat = (rng.randn(S, n_sym * sym)
                + 1j * rng.randn(S, n_sym * sym)).astype(np.complex64)
        x_t = flat.reshape(S, n_sym, sym)[:, :, cp:]
        _, d_p = payload_fused(jnp.asarray(x_t), W, gain, tab, norm,
                               interpret=True, packed=True)
        sig_s, d_s = payload_fused_strip(
            jnp.real(jnp.asarray(flat)), jnp.imag(jnp.asarray(flat)),
            W, gain, tab, norm, n_sym=n_sym, symbol_len=sym, cp_len=cp,
            interpret=True)
        assert d_s.shape[1] % 16 == 0  # whole supergroups (npad)
        np.testing.assert_array_equal(
            np.asarray(d_p)[:, :n_sym], np.asarray(d_s)[:, :n_sym])


def test_decode_fused_strip_matches_xla():
    """decode(payload_impl='fused_strip') skips the XLA CP-strip chain
    entirely and still produces the XLA tail's decisions — including
    through the flat-payload CFO-residual rotation path."""
    for extra in ({}, {"correct_cfo": True}):
        cfg = ModemConfig(pid_max=12, bit_exact=False, **extra)
        spec = simulator.ChannelSpec(
            snr_db=30.0, delay=3000,
            cfo_subcarriers=0.12 if extra else 0.0)
        capture, tx_data, _ = simulator.simulate_capture(cfg, spec)
        r_x = rx.decode(jnp.asarray(capture), cfg, payload_impl="xla")
        r_s = rx.decode(jnp.asarray(capture), cfg,
                        payload_impl="fused_strip")
        perm = np.asarray(r_s.payload_perm)
        m = cfg.M_occupied
        n = cfg.pid_max * m
        d = np.asarray(r_s.rx_data).reshape(cfg.num_streams, -1, m)[
            :, :, perm].reshape(cfg.num_streams, -1)[:, :n]
        assert int((d != np.asarray(r_x.rx_data)[:, :n]).sum()) == 0
        rep = __import__("rub_mimo_tpu.pipeline.report",
                         fromlist=["score"]).score(r_s, tx_data, cfg)
        assert rep.symbol_error_rate == [0.0, 0.0]
