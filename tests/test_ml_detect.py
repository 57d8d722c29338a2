"""Joint maximum-likelihood detection (detect/ml.py)."""

import numpy as np
import jax.numpy as jnp
import pytest

from rub_mimo_tpu.config import Detector, Modulation, tiny_config
from rub_mimo_tpu.detect import ml as ml_mod
from rub_mimo_tpu.ofdm import constellation


def test_ml_matches_brute_force_loop():
    """The batched lattice search must reproduce a per-(symbol, subcarrier)
    exhaustive numpy argmin."""
    rng = np.random.default_rng(0)
    cfg = tiny_config(modulation=Modulation.QAM16)
    n_sym, S, n_sc = 5, 2, 12
    G = (rng.normal(size=(n_sc, S, S)) + 1j * rng.normal(size=(n_sc, S, S))
         ).astype(np.complex64)
    t = constellation.table(cfg.modulation)
    arity = len(t)
    tx_idx = rng.integers(0, arity, size=(n_sym, S, n_sc))
    s = t[tx_idx]                                     # [n_sym, tx, n_sc]
    Y = np.einsum("krt,ntk->nrk", G, s) + 0.3 * (
        rng.normal(size=(n_sym, S, n_sc))
        + 1j * rng.normal(size=(n_sym, S, n_sc))
    ).astype(np.complex64)

    got = np.asarray(ml_mod.ml_detect(jnp.asarray(Y), jnp.asarray(G), cfg,
                                      block=2))

    want = np.zeros_like(got)
    combos = np.stack(np.meshgrid(np.arange(arity), np.arange(arity),
                                  indexing="ij"), -1).reshape(-1, 2)
    pts = t[combos]                                   # [C, 2]
    for n in range(n_sym):
        for k in range(n_sc):
            d = Y[n, :, k][None, :] - pts @ G[k].T    # [C, rx]
            best = np.argmin((np.abs(d) ** 2).sum(-1))
            want[n, :, k] = combos[best]
    np.testing.assert_array_equal(got, want)


def test_ml_beats_zf_on_ill_conditioned_channel():
    """On a near-rank-1 channel ZF blows up the noise; the lattice search
    must do strictly better."""
    from rub_mimo_tpu.io import simulator
    from rub_mimo_tpu.ofdm import framegen
    from rub_mimo_tpu.pipeline import report, rx

    spec = simulator.ChannelSpec(snr_db=18.0, delay=300, seed=2)
    h = simulator.draw_channel(spec, 2, 2)
    h[1, :, 0] = h[0, :, 0] * 1.05 + 0.1
    base = dict(bit_exact=False, plateau_threshold=0.5,
                modulation=Modulation.QAM16)
    cfg = tiny_config(**base)
    tx_data = framegen.generate_payload_symbols(cfg, seed=0)
    tx = framegen.transmit_frame(cfg, jnp.asarray(tx_data))
    cap = simulator.apply_channel(tx, h, spec, cfg)

    sers = {}
    for det in (Detector.ZF, Detector.ML):
        c = tiny_config(detector=det, **base)
        rep = report.score(rx.decode(cap, c), tx_data, c)
        assert rep.synced
        sers[det] = max(rep.symbol_error_rate)
    assert sers[Detector.ML] < sers[Detector.ZF], sers


def test_ml_consistent_across_pipelines():
    """offline == sharded == streaming decisions with detector=ml."""
    from rub_mimo_tpu.io import simulator
    from rub_mimo_tpu.parallel import decode_sharded, mesh as mesh_mod
    from rub_mimo_tpu.pipeline import rx, streaming

    cfg = tiny_config(bit_exact=False, detector=Detector.ML,
                      modulation=Modulation.QAM16, pid_max=16)
    spec = simulator.ChannelSpec(snr_db=25.0, delay=333, seed=4)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    ref = rx.decode(cap, cfg)
    assert bool(ref.synced)

    m = mesh_mod.make_mesh(4, 1)
    iq = mesh_mod.shard_capture(cap, m)
    dec = decode_sharded.build_sharded_decoder(cfg, m, iq.shape[-1])
    got = dec(iq)
    np.testing.assert_array_equal(
        np.asarray(got.rx_data), np.asarray(ref.rx_data)
    )

    sdec = streaming.decode_stream(np.asarray(cap), cfg, chunk_size=256)
    sdec.finalize()
    _, rx_data = sdec.result()
    agree = (rx_data == np.asarray(ref.rx_data)).mean()
    assert agree > 0.999, agree


def test_ml_soft_llrs_sign_matches_truth_noiseless():
    """On a noiseless channel every LLR must point at the transmitted
    bit (positive -> 0, negative -> 1, MSB-first)."""
    rng = np.random.default_rng(0)
    cfg = tiny_config(modulation=Modulation.QAM16, detector=Detector.ML)
    n_sym, S, n_sc = 4, 2, 8
    G = (rng.normal(size=(n_sc, S, S))
         + 1j * rng.normal(size=(n_sc, S, S))).astype(np.complex64)
    t = constellation.table(cfg.modulation)
    tx_idx = rng.integers(0, 16, size=(n_sym, S, n_sc))
    Y = np.einsum("krt,ntk->nrk", G, t[tx_idx]).astype(np.complex64)
    llrs = np.asarray(
        ml_mod.ml_soft_llrs(jnp.asarray(Y), jnp.asarray(G), cfg)
    )
    hard = (llrs < 0).astype(int)
    bits_true = (tx_idx[..., None] >> np.arange(3, -1, -1)) & 1
    np.testing.assert_array_equal(hard, bits_true)


def test_ml_soft_llrs_rescue_coded_payload():
    """Coded 2x2 on a near-rank-1 channel: per-stream LLRs after ZF are
    hopeless, joint lattice LLRs decode almost clean."""
    from rub_mimo_tpu.io import simulator
    from rub_mimo_tpu.ofdm import fec, framegen
    from rub_mimo_tpu.pipeline import rx

    spec = simulator.ChannelSpec(snr_db=14.0, delay=300, seed=2)
    h = simulator.draw_channel(spec, 2, 2)
    h[1, :, 0] = h[0, :, 0] * 1.05 + 0.1
    base = dict(bit_exact=False, plateau_threshold=0.5,
                modulation=Modulation.QAM16, pid_max=32)
    cfg_zf = tiny_config(**base)
    msg, txd = fec.encode_payload(cfg_zf, seed=11)
    tx = framegen.transmit_frame(cfg_zf, jnp.asarray(txd))
    cap = simulator.apply_channel(tx, h, spec, cfg_zf)

    r_zf = rx.decode(cap, cfg_zf)
    ber_zf = (np.asarray(fec.decode_payload(r_zf.rx_sig, cfg_zf))
              != msg).mean()
    cfg_ml = tiny_config(detector=Detector.ML, **base)
    r_ml = rx.decode(cap, cfg_ml)
    assert r_ml.Y is not None
    ber_ml = (np.asarray(fec.decode_payload_ml(r_ml, cfg_ml))
              != msg).mean()
    assert ber_zf > 0.1, ber_zf
    assert ber_ml < 0.01, ber_ml


def test_ml_validation():
    from rub_mimo_tpu.config import CommMode

    with pytest.raises(ValueError):
        tiny_config(detector=Detector.ML, mode=CommMode.SISO).validate()
    with pytest.raises(ValueError):
        tiny_config(detector=Detector.ML, num_streams=3,
                    modulation=Modulation.QAM256).validate()
    with pytest.raises(ValueError):
        tiny_config(detector=Detector.ML, track_channel=True,
                    pid_max=16).validate()
