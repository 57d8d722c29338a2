"""Convolutional FEC + soft Viterbi (ofdm/fec.py) — unit and end-to-end."""

import itertools

import numpy as np
import jax.numpy as jnp
import pytest

from rub_mimo_tpu.config import tiny_config
from rub_mimo_tpu.ofdm import fec


def test_encoder_impulse_response_is_standard_171_133():
    """The impulse response must interleave the generator taps — pins the
    exact 802.11a/Voyager code, not an equivalent-but-reordered one."""
    imp = jnp.asarray(np.array([1, 0, 0, 0, 0, 0, 0], np.int32))
    coded = np.asarray(fec.conv_encode(imp))
    g1 = [1, 1, 1, 1, 0, 0, 1]  # 0o171
    g2 = [1, 0, 1, 1, 0, 1, 1]  # 0o133
    want = [b for t in range(7) for b in (g1[t], g2[t])]
    assert list(coded[:14]) == want


def test_clean_round_trip_batched():
    rng = np.random.default_rng(0)
    msg = rng.integers(0, 2, size=(3, 200)).astype(np.int32)
    coded = fec.conv_encode(jnp.asarray(msg))
    assert coded.shape == (3, 2 * (200 + fec.TAIL))
    llr = 1.0 - 2.0 * np.asarray(coded).astype(np.float32)
    dec = np.asarray(fec.viterbi_decode(jnp.asarray(llr)))
    np.testing.assert_array_equal(dec, msg)


def test_viterbi_is_maximum_likelihood():
    """On random LLRs the trellis decode must achieve the same path score
    as exhaustive search over all 2^n messages."""
    rng = np.random.default_rng(7)
    n = 8
    allmsgs = np.array(
        list(itertools.product([0, 1], repeat=n)), np.int32
    )
    allcoded = np.asarray(fec.conv_encode(jnp.asarray(allmsgs)))
    for _ in range(10):
        llr = rng.normal(size=allcoded.shape[-1]).astype(np.float32) * 2.0
        scores = (1 - 2 * allcoded) * 0.5 @ llr
        dec = np.asarray(fec.viterbi_decode(jnp.asarray(llr)))
        dec_coded = np.asarray(fec.conv_encode(jnp.asarray(dec)))
        s_dec = (1 - 2 * dec_coded) * 0.5 @ llr
        assert np.isclose(s_dec, scores.max(), rtol=1e-5)


def test_corrects_hard_bit_flips():
    rng = np.random.default_rng(1)
    msg = rng.integers(0, 2, size=(2, 2000)).astype(np.int32)
    coded = np.asarray(fec.conv_encode(jnp.asarray(msg))).astype(np.float32)
    llr = 1.0 - 2.0 * coded
    flip = rng.random(llr.shape) < 0.05
    llr[flip] *= -1.0
    dec = np.asarray(fec.viterbi_decode(jnp.asarray(llr)))
    ber = (dec != msg).mean()
    assert ber < 0.005, ber


def test_bit_symbol_packing_round_trip():
    from rub_mimo_tpu.config import Modulation

    rng = np.random.default_rng(2)
    for mod in (Modulation.QPSK, Modulation.QAM16, Modulation.ARB32OPT):
        syms = rng.integers(0, 1 << mod.bits_per_symbol, size=(2, 60))
        bits = fec.symbols_to_bits(jnp.asarray(syms), mod)
        back = np.asarray(fec.bits_to_symbols(bits, mod))
        np.testing.assert_array_equal(back, syms)


@pytest.mark.slow
def test_coded_beats_uncoded_end_to_end():
    """Full pipeline at an SNR where the uncoded chain makes symbol
    errors: the coded payload must decode with (near-)zero BER."""
    from rub_mimo_tpu.io import simulator
    from rub_mimo_tpu.pipeline import rx

    cfg = tiny_config(bit_exact=False, pid_max=32, sync_fallback=True)
    msg, txd = fec.encode_payload(cfg, seed=42)
    spec = simulator.ChannelSpec(snr_db=10.0, delay=300, seed=42)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec, tx_data=txd)
    result = rx.decode(cap, cfg)
    assert bool(result.synced)

    n = cfg.pid_max * cfg.M_occupied
    uncoded_errs = int(
        (np.asarray(result.rx_data)[:, :n] != tx_data[:, :n]).sum()
    )
    assert uncoded_errs > 0, "SNR too high for the test to be meaningful"

    dec = np.asarray(fec.decode_payload(result.rx_sig, cfg))
    ber = (dec != msg).mean()
    assert ber < 1e-3, (uncoded_errs, ber)


def test_interleaver_round_trip():
    rng = np.random.default_rng(3)
    x = rng.normal(size=(2, 1001)).astype(np.float32)
    y = fec.interleave(jnp.asarray(x), fec.INTERLEAVE_SPREAD)
    back = np.asarray(fec.deinterleave(y, fec.INTERLEAVE_SPREAD))
    np.testing.assert_array_equal(back, x)
    assert not np.array_equal(np.asarray(y), x)


def test_interleaver_breaks_burst_errors():
    """A 60-bit burst exceeds the K=7 code's correction span when the
    coded stream is sent in order, but interleaving spreads it thin."""
    rng = np.random.default_rng(4)
    msg = rng.integers(0, 2, size=(1, 4000)).astype(np.int32)
    coded = np.asarray(fec.conv_encode(jnp.asarray(msg))).astype(np.float32)
    bers = {}
    for il in (False, True):
        wire = np.asarray(
            fec.interleave(jnp.asarray(coded), fec.INTERLEAVE_SPREAD)
        ) if il else coded.copy()
        llr_wire = 1.0 - 2.0 * wire
        for start in range(100, llr_wire.shape[-1] - 100, 800):
            llr_wire[:, start : start + 60] *= -1.0   # burst flips
        llr = np.asarray(
            fec.deinterleave(jnp.asarray(llr_wire), fec.INTERLEAVE_SPREAD)
        ) if il else llr_wire
        dec = np.asarray(fec.viterbi_decode(jnp.asarray(llr)))
        bers[il] = (dec != msg).mean()
    assert bers[False] > 0.01, bers
    assert bers[True] == 0.0, bers


@pytest.mark.slow
def test_interleaving_helps_on_selective_channel():
    """End to end on a 6-tap channel (deep per-subcarrier fades): coded
    BER with interleaving must beat coded BER without."""
    from rub_mimo_tpu.config import Modulation
    from rub_mimo_tpu.io import simulator
    from rub_mimo_tpu.pipeline import rx

    cfg = tiny_config(bit_exact=False, pid_max=32, sync_fallback=True,
                      modulation=Modulation.QAM16)
    bers = {}
    for il in (False, True):
        msg, txd = fec.encode_payload(cfg, seed=5, interleave_bits=il)
        spec = simulator.ChannelSpec(snr_db=14.0, delay=300, seed=5,
                                     flat=False, num_taps=6)
        cap, _, _ = simulator.simulate_capture(cfg, spec, tx_data=txd)
        r = rx.decode(cap, cfg)
        assert bool(r.synced)
        dec = np.asarray(
            fec.decode_payload(r.rx_sig, cfg, interleave_bits=il)
        )
        bers[il] = (dec != msg).mean()
    assert bers[True] < bers[False], bers


def test_encode_payload_single_lane_modes():
    from rub_mimo_tpu.config import CommMode

    cfg = tiny_config(mode=CommMode.ALAMOUTI, pid_max=16)
    msg, txd = fec.encode_payload(cfg, seed=0)
    assert msg.shape[0] == 1
    assert txd.shape == (cfg.num_streams, cfg.pid_max * cfg.M_occupied)
    assert (txd[1] == 0).all()  # lane 1 carries no independent data


@pytest.mark.slow
def test_wifi_like_preset_coded_chain():
    """The 802.11a-shaped preset end to end: guard bands + pilots + CFO +
    selective channel + rate-1/2 coded 16-QAM payload."""
    from rub_mimo_tpu.io import simulator
    from rub_mimo_tpu.models import presets
    from rub_mimo_tpu.pipeline import rx

    cfg, spec = presets.get("wifi_like", pid_max=48)
    msg, txd = fec.encode_payload(cfg, seed=9)
    cap, _, _ = simulator.simulate_capture(cfg, spec, tx_data=txd)
    r = rx.decode(cap, cfg)
    assert bool(r.synced)
    dec = np.asarray(fec.decode_payload(r.rx_sig, cfg))
    ber = (dec != msg).mean()
    assert ber < 1e-3, ber


def test_cli_fec_flag():
    from rub_mimo_tpu.apps import cli

    rc = cli.main(
        "run --cpu --num_subcarriers 64 --cp_len 16 --num_access_codes 4"
        " --frames 16 --modulation qpsk --snr 25 --delay 300"
        " --fec conv_k7 --quiet".split()
    )
    assert rc in (0, None)


@pytest.mark.parametrize("rate", ["2/3", "3/4"])
def test_punctured_rates_round_trip_and_correct(rate):
    """802.11a punctured rates: clean round trip, and correction of
    scattered hard flips (fewer than rate 1/2, but real)."""
    rng = np.random.default_rng(6)
    n = 1200
    msg = rng.integers(0, 2, size=(2, n)).astype(np.int32)
    coded = np.asarray(fec.conv_encode(jnp.asarray(msg)))
    kept = np.asarray(fec.puncture(jnp.asarray(coded), rate)).astype(
        np.float32
    )
    llr = 1.0 - 2.0 * kept
    dep = fec.depuncture_llrs(jnp.asarray(llr), coded.shape[-1], rate)
    dec = np.asarray(fec.viterbi_decode(dep))
    np.testing.assert_array_equal(dec, msg)

    llr2 = llr.copy()
    flip = rng.random(llr.shape) < 0.02
    llr2[flip] *= -1.0
    dep2 = fec.depuncture_llrs(jnp.asarray(llr2), coded.shape[-1], rate)
    dec2 = np.asarray(fec.viterbi_decode(dep2))
    assert (dec2 != msg).mean() < 0.01


def test_punctured_payload_end_to_end_more_throughput():
    """rate 3/4 carries 1.5x the info bits of rate 1/2 through the same
    symbol budget and still decodes clean at moderate SNR."""
    from rub_mimo_tpu.io import simulator
    from rub_mimo_tpu.pipeline import rx

    cfg = tiny_config(bit_exact=False, pid_max=32, sync_fallback=True)
    n_half = fec.message_bits_per_stream(cfg, "1/2")
    n_34 = fec.message_bits_per_stream(cfg, "3/4")
    assert n_34 > 1.45 * n_half

    msg, txd = fec.encode_payload(cfg, seed=3, rate="3/4")
    spec = simulator.ChannelSpec(snr_db=16.0, delay=300, seed=3)
    cap, _, _ = simulator.simulate_capture(cfg, spec, tx_data=txd)
    r = rx.decode(cap, cfg)
    assert bool(r.synced)
    dec = np.asarray(fec.decode_payload(r.rx_sig, cfg, rate="3/4"))
    assert (dec != msg).mean() < 1e-3


@pytest.mark.slow
def test_data_transport_round_trip():
    """Real bytes (length + CRC-32 header) through a channel with raw
    symbol errors: recovered bit-exact."""
    import os

    from rub_mimo_tpu.config import Modulation
    from rub_mimo_tpu.io import simulator
    from rub_mimo_tpu.pipeline import rx

    cfg = tiny_config(bit_exact=False, pid_max=64,
                      modulation=Modulation.QAM16, sync_fallback=True)
    data = os.urandom(900)
    txd = fec.encode_data(data, cfg)
    spec = simulator.ChannelSpec(snr_db=12.0, delay=300, seed=1)
    cap, _, _ = simulator.simulate_capture(cfg, spec, tx_data=txd)
    r = rx.decode(cap, cfg)
    assert bool(r.synced)
    out, ok = fec.decode_data(r.rx_sig, cfg)
    assert ok and out == data


def test_data_transport_capacity_and_garbage():
    import numpy as np_

    cfg = tiny_config(pid_max=16)
    cap_bytes = fec.data_capacity_bytes(cfg)
    with pytest.raises(ValueError):
        fec.encode_data(b"x" * (cap_bytes + 1), cfg)
    # noise-only "decode": must return (something, False), not raise
    rng = np_.random.default_rng(0)
    junk = (rng.normal(size=(cfg.num_streams,
                             cfg.pid_max * cfg.M_occupied))
            + 1j * rng.normal(size=(cfg.num_streams,
                                    cfg.pid_max * cfg.M_occupied))
            ).astype(np_.complex64)
    out, ok = fec.decode_data(jnp.asarray(junk), cfg)
    assert ok is False or out == b""  # CRC catches garbage


def test_cli_file_transfer(tmp_path):
    from rub_mimo_tpu.apps import cli

    src = tmp_path / "payload.bin"
    dst = tmp_path / "recovered.bin"
    src.write_bytes(b"hello modem " * 50)
    rc = cli.main(
        f"run --cpu --num_subcarriers 64 --cp_len 16 --num_access_codes 4"
        f" --frames 64 --modulation qam16 --snr 14 --delay 300"
        f" --send-file {src} --recv-out {dst} --sync-fallback"
        f" --quiet".split()
    )
    assert rc in (0, None)
    assert dst.read_bytes() == src.read_bytes()


def test_data_transport_header_guard_and_ml_route():
    """Tiny payloads that cannot carry the 64-bit header are refused;
    decode_data accepts a DecodeResult and routes ML decodes through the
    joint soft-LLR path."""
    from rub_mimo_tpu.config import CommMode, Detector, Modulation
    from rub_mimo_tpu.io import simulator
    from rub_mimo_tpu.pipeline import rx

    tiny = tiny_config(pid_max=1, mode=CommMode.SISO)
    assert fec.data_capacity_bytes(tiny) == 0
    with pytest.raises(ValueError):
        fec.encode_data(b"", tiny)

    cfg = tiny_config(bit_exact=False, pid_max=32, sync_fallback=True,
                      modulation=Modulation.QAM16,
                      detector=Detector.ML)
    data = b"ml route check " * 20
    txd = fec.encode_data(data, cfg)
    spec = simulator.ChannelSpec(snr_db=12.0, delay=300, seed=1)
    cap, _, _ = simulator.simulate_capture(cfg, spec, tx_data=txd)
    r = rx.decode(cap, cfg)
    assert r.Y is not None
    out, ok = fec.decode_data(r, cfg)
    assert ok and out == data


def test_windowed_viterbi_matches_full():
    """Block-parallel windowed Viterbi must reproduce the full-scan ML
    decode on noisy codewords (margin >> 5K path-convergence depth)."""
    rng = np.random.default_rng(11)
    bits = jnp.asarray(rng.integers(0, 2, size=(2, 40000)).astype(np.int32))
    coded = fec.conv_encode(bits)
    # BPSK-ish soft llrs at ~4 dB Eb/N0: plenty of channel errors
    llr = (1.0 - 2.0 * np.asarray(coded)).astype(np.float32)
    llr = llr + rng.normal(scale=0.65, size=llr.shape).astype(np.float32)
    llr = jnp.asarray(2.0 * llr)
    full = fec.viterbi_decode(llr)
    win = fec.viterbi_decode(llr, window=4096, margin=128)
    hard_errs_full = int(jnp.sum(full != bits))
    assert hard_errs_full < bits.size * 0.01  # sanity: code is working
    np.testing.assert_array_equal(np.asarray(win), np.asarray(full))
