"""Streaming decoder vs offline decode: identical results, chunk by chunk."""

import numpy as np
import jax.numpy as jnp
import pytest

from rub_mimo_tpu.config import CommMode, Detector, tiny_config
from rub_mimo_tpu.io import simulator
from rub_mimo_tpu.pipeline import rx, streaming


def _capture(cfg, seed=11, delay=501, snr=35.0):
    spec = simulator.ChannelSpec(snr_db=snr, delay=delay, seed=seed)
    return simulator.simulate_capture(cfg, spec)


@pytest.mark.parametrize("chunk", [128, 256, 1024])
def test_streaming_matches_offline(chunk):
    cfg = tiny_config(bit_exact=False)
    cap, tx_data, _ = _capture(cfg)
    ref = rx.decode(cap, cfg)
    assert bool(ref.synced)

    dec = streaming.decode_stream(np.asarray(cap), cfg, chunk_size=chunk)
    dec.finalize()
    assert dec.synced
    assert dec.sync_index == int(ref.sync_index)
    assert dec.decode_start == int(ref.sync_index) - cfg.symbol_len + int(
        ref.decode_start
    )
    rx_sig, rx_data = dec.result()
    # compare the frames the stream actually saw (all of them here)
    np.testing.assert_array_equal(rx_data, np.asarray(ref.rx_data))
    np.testing.assert_allclose(
        rx_sig, np.asarray(ref.rx_sig), rtol=1e-4, atol=1e-5
    )


@pytest.mark.slow
def test_streaming_sync_across_chunk_boundary():
    """Place the frame so the plateau straddles a chunk boundary."""
    cfg = tiny_config(bit_exact=False)
    # chunk 128: delay 501 puts sync around sample ~560 (chunk 4/5 edge);
    # scan a few delays to cross boundaries
    for delay in (120, 127, 128, 129, 250):
        spec = simulator.ChannelSpec(snr_db=35.0, delay=delay, seed=5)
        cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
        ref = rx.decode(cap, cfg)
        if not bool(ref.synced):
            continue
        dec = streaming.decode_stream(np.asarray(cap), cfg, chunk_size=128)
        dec.finalize()
        assert dec.sync_index == int(ref.sync_index), f"delay {delay}"
        _, rx_data = dec.result()
        np.testing.assert_array_equal(rx_data, np.asarray(ref.rx_data))


def test_streaming_mmse():
    cfg = tiny_config(bit_exact=False, detector=Detector.MMSE,
                      mmse_noise_var=1e-3)
    cap, tx_data, _ = _capture(cfg, seed=4, delay=130)
    ref = rx.decode(cap, cfg)
    dec = streaming.decode_stream(np.asarray(cap), cfg, chunk_size=256)
    dec.finalize()
    _, rx_data = dec.result()
    np.testing.assert_array_equal(rx_data, np.asarray(ref.rx_data))


def test_streaming_emits_incrementally():
    """Frames must be emitted as their samples arrive, not all at the end."""
    cfg = tiny_config(bit_exact=False)
    cap, _, _ = _capture(cfg)
    cap = np.asarray(cap)
    C = 256
    nc = -(-cap.shape[-1] // C)
    padded = np.pad(cap, ((0, 0), (0, nc * C - cap.shape[-1])))
    dec = streaming.StreamingDecoder(cfg, chunk_size=C)
    emit_chunks = []
    for i in range(nc):
        out = dec.push(padded[:, i * C : (i + 1) * C])
        if out:
            emit_chunks.append((i, [k for k, _ in out]))
    dec.finalize()
    # emissions happen across multiple chunks
    assert len(emit_chunks) >= 2
    all_ks = sorted(k for _, ks in emit_chunks for k in ks)
    assert all_ks == list(range(cfg.pid_max))


def test_streaming_with_native_reader(tmp_path):
    """io.native.StreamReader -> StreamingDecoder end-to-end."""
    from rub_mimo_tpu.io import capture as capio
    from rub_mimo_tpu.io import native

    cfg = tiny_config(bit_exact=False)
    cap, tx_data, _ = _capture(cfg)
    cap = np.asarray(cap)
    ref = rx.decode(jnp.asarray(cap), cfg)
    capio.write_capture(tmp_path, cap, prefix="rx")

    C = 512
    readers = [
        native.StreamReader(tmp_path / f"rx{s + 1}.dat", block_samples=C)
        for s in range(cfg.num_streams)
    ]
    dec = streaming.StreamingDecoder(cfg, chunk_size=C)
    while True:
        blocks = []
        for r in readers:
            try:
                blocks.append(next(r))
            except StopIteration:
                blocks.append(np.zeros(0, np.complex64))
        n = max(len(b) for b in blocks)
        if n == 0:
            break
        chunk = np.zeros((cfg.num_streams, C), np.complex64)
        for s, b in enumerate(blocks):
            chunk[s, : len(b)] = b
        dec.push(chunk)
    dec.finalize()
    for r in readers:
        r.close()
    _, rx_data = dec.result()
    np.testing.assert_array_equal(rx_data, np.asarray(ref.rx_data))


def test_streaming_mmse_auto_noise_matches_offline():
    """Regression (code review): streaming must honour mmse_auto_noise —
    with a wildly wrong fixed mmse_noise_var, auto-noise must still match
    the offline decode exactly."""
    cfg = tiny_config(bit_exact=False, detector=Detector.MMSE,
                      mmse_auto_noise=True, mmse_noise_var=10.0)
    cap, tx_data, _ = _capture(cfg, seed=4, delay=130)
    ref = rx.decode(cap, cfg)
    dec = streaming.decode_stream(np.asarray(cap), cfg, chunk_size=256)
    dec.finalize()
    _, rx_data = dec.result()
    np.testing.assert_array_equal(rx_data, np.asarray(ref.rx_data))


def test_streaming_cfo_matches_offline():
    """CFO support in streaming: coarse at the plateau fire + residual at
    estimation, applied through carried rotation state == offline."""
    cfg = tiny_config(bit_exact=False, correct_cfo=True)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=256, seed=31,
                                 cfo_subcarriers=0.11)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    ref = rx.decode(cap, cfg)
    assert bool(ref.synced)
    dec = streaming.decode_stream(np.asarray(cap), cfg, chunk_size=256)
    dec.finalize()
    assert dec.synced
    assert abs(dec.cfo_hat - float(ref.cfo_hat)) < 1e-3
    _, rx_data = dec.result()
    np.testing.assert_array_equal(rx_data, np.asarray(ref.rx_data))


def test_streaming_fallback_acquires():
    """Per-chunk S0-xcorr fallback: a 10 dB capture the plateau cannot
    acquire decodes through the streaming path."""
    from rub_mimo_tpu.pipeline import report as report_mod

    cfg = tiny_config(bit_exact=False, sync_fallback=True)
    spec = simulator.ChannelSpec(snr_db=10.0, delay=350, seed=13)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    ref = rx.decode(cap, cfg)
    assert bool(ref.synced)
    dec = streaming.decode_stream(np.asarray(cap), cfg, chunk_size=256)
    dec.finalize()
    assert dec.synced
    assert dec.sync_index == int(ref.sync_index)
    _, rx_data = dec.result()
    np.testing.assert_array_equal(rx_data, np.asarray(ref.rx_data))


def test_streaming_fallback_with_cfo():
    """Fallback + CFO combined in streaming (S0-halves coarse + residual)."""
    from rub_mimo_tpu.pipeline import report as report_mod

    cfg = tiny_config(bit_exact=False, sync_fallback=True, correct_cfo=True)
    spec = simulator.ChannelSpec(snr_db=12.0, delay=350, seed=13,
                                 cfo_subcarriers=0.11)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    ref = rx.decode(cap, cfg)
    assert bool(ref.synced)
    dec = streaming.decode_stream(np.asarray(cap), cfg, chunk_size=256)
    dec.finalize()
    assert dec.synced
    assert abs(dec.cfo_hat - float(ref.cfo_hat)) < 5e-3
    _, rx_data = dec.result()
    # decisions at 12 dB: require match rate with the offline decode
    agree = (rx_data == np.asarray(ref.rx_data)).mean()
    assert agree > 0.95, agree


@pytest.mark.slow
def test_streaming_cfo_overshoot_regression():
    """Regression (code review round 2): the estimation-trigger overshoot
    tail must be enqueued in coarse-derotated space.  delay/seed chosen so
    overshoot is large; verified to produce up to 48% SER before the fix."""
    cfg = tiny_config(bit_exact=False, correct_cfo=True)
    spec = simulator.ChannelSpec(snr_db=30.0, delay=300, seed=31,
                                 cfo_subcarriers=0.11)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    ref = rx.decode(cap, cfg)
    assert bool(ref.synced)
    for chunk in (200, 512):
        dec = streaming.decode_stream(np.asarray(cap), cfg, chunk_size=chunk)
        dec.finalize()
        _, rx_data = dec.result()
        agree = (rx_data == np.asarray(ref.rx_data)).mean()
        assert agree > 0.999, f"chunk {chunk}: {agree}"


@pytest.mark.parametrize("chunk", [256, 1024])
def test_streaming_multiburst_rearm(chunk):
    """After a burst's payload completes the decoder re-arms to SEEK and
    acquires the NEXT burst in the same stream — frame-for-frame equal to
    the offline multi-burst decode (rx.decode_all)."""
    from rub_mimo_tpu.ofdm import framegen
    from rub_mimo_tpu.pipeline import report

    cfg = tiny_config(bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=0, trailing=0, seed=5)
    h = simulator.draw_channel(spec, 2, 2)

    data1 = framegen.generate_payload_symbols(cfg, seed=1)
    data2 = framegen.generate_payload_symbols(cfg, seed=2)
    tx1 = framegen.transmit_frame(cfg, jnp.asarray(data1))
    tx2 = framegen.transmit_frame(cfg, jnp.asarray(data2))
    gap = cfg.window_len + 3 * cfg.symbol_len
    tx = jnp.concatenate(
        [
            jnp.zeros((2, 300), jnp.complex64), tx1,
            jnp.zeros((2, max(64, gap - tx1.shape[-1])), jnp.complex64),
            tx2,
            jnp.zeros((2, 500), jnp.complex64),
        ],
        axis=-1,
    )
    cap = simulator.apply_channel(tx, h, spec, cfg)

    offline = rx.decode_all(cap, cfg, max_bursts=4)
    assert len(offline) == 2

    dec = streaming.decode_stream(np.asarray(cap), cfg, chunk_size=chunk)
    dec.finalize()
    bursts = dec.burst_results()
    assert len(bursts) == 2
    for (sync_idx, _, rx_data), ref in zip(bursts, offline):
        assert sync_idx == int(ref.sync_index)
        np.testing.assert_array_equal(rx_data, np.asarray(ref.rx_data))

    # each burst decodes its own payload (not a stale copy of burst 0)
    rep1 = report.score(offline[0], data1, cfg)
    rep2 = report.score(offline[1], data2, cfg)
    assert rep1.synced and rep2.synced
    assert not np.array_equal(bursts[0][2], bursts[1][2])


def test_streaming_single_burst_api_unchanged():
    """A single-burst stream re-arms after its payload, but the public
    first-burst attributes and result() keep reporting burst 0."""
    cfg = tiny_config(bit_exact=False)
    cap, tx_data, _ = _capture(cfg, seed=3, delay=222)
    ref = rx.decode(cap, cfg)
    assert bool(ref.synced)
    dec = streaming.decode_stream(np.asarray(cap), cfg, chunk_size=256)
    dec.finalize()
    assert dec.synced
    assert len(dec.bursts) == 1  # payload span completed -> re-armed
    assert dec.sync_index == int(ref.sync_index)
    _, rx_data = dec.result()
    np.testing.assert_array_equal(rx_data, np.asarray(ref.rx_data))


@pytest.mark.parametrize("block_chunks", [2, 5])
def test_push_block_matches_push(block_chunks):
    """push_block (batched seek, one fetch per block) must be
    frame-for-frame identical to chunk-at-a-time push."""
    cfg = tiny_config(bit_exact=False)
    cap, tx_data, _ = _capture(cfg, delay=900)
    chunk = 128
    ref = streaming.decode_stream(np.asarray(cap), cfg, chunk_size=chunk)
    ref.finalize()
    assert ref.synced

    dec = streaming.StreamingDecoder(cfg, chunk)
    capn = np.asarray(cap)
    T = capn.shape[-1]
    B = chunk * block_chunks
    nb = -(-T // B)
    padded = np.pad(capn, ((0, 0), (0, nb * B - T)))
    for i in range(nb):
        dec.push_block(padded[:, i * B:(i + 1) * B])
    dec.finalize()
    assert dec.synced and dec.sync_index == ref.sync_index
    sig_a, data_a = ref.result()
    sig_b, data_b = dec.result()
    np.testing.assert_array_equal(data_b, data_a)
    np.testing.assert_allclose(sig_b, sig_a, rtol=1e-5, atol=1e-6)


def test_push_block_late_sync():
    """Sync deep inside the capture: many all-seek blocks first (the
    fast path commits scanned state), then a fire mid-block."""
    cfg = tiny_config(bit_exact=False)
    cap, tx_data, _ = _capture(cfg, delay=2000)
    chunk = 128
    ref = streaming.decode_stream(np.asarray(cap), cfg, chunk_size=chunk)
    ref.finalize()
    if not ref.synced:
        pytest.skip("no sync at this geometry")
    dec = streaming.StreamingDecoder(cfg, chunk)
    capn = np.asarray(cap)
    B = chunk * 4
    T = capn.shape[-1]
    nb = -(-T // B)
    padded = np.pad(capn, ((0, 0), (0, nb * B - T)))
    for i in range(nb):
        dec.push_block(padded[:, i * B:(i + 1) * B])
    dec.finalize()
    assert dec.synced and dec.sync_index == ref.sync_index
    _, data_a = ref.result()
    _, data_b = dec.result()
    np.testing.assert_array_equal(data_b, data_a)
