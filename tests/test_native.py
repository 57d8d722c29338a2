"""Tests for the native IQ ingest runtime (and its numpy fallback)."""

import numpy as np
import pytest

from rub_mimo_tpu.io import native


def test_native_library_builds():
    # g++ is available in CI; the library must build and load
    assert native.available(), "native ingest library failed to build/load"


def test_sc16_roundtrip():
    rng = np.random.default_rng(0)
    # sc16 full scale is +/-1.0: keep values inside to avoid clamping
    iq = (rng.uniform(-0.9, 0.9, 1000) + 1j * rng.uniform(-0.9, 0.9, 1000)).astype(
        np.complex64
    )
    raw = native.fc32_to_sc16(iq)
    assert raw.dtype == np.int16 and raw.size == 2000
    back = native.sc16_to_fc32(raw)
    np.testing.assert_allclose(back, iq, atol=2.0 / 32767.0)


def test_sc16_clamps():
    iq = np.array([10.0 + 10.0j, -10.0 - 10.0j], dtype=np.complex64)
    raw = native.fc32_to_sc16(iq)
    assert raw.max() == 32767 and raw.min() == -32768


def test_validate():
    iq = np.ones(100, dtype=np.complex64) * (0.5 + 0.25j)
    ok, peak = native.validate_fc32(iq)
    assert ok and abs(peak - 0.5) < 1e-6
    iq[3] = np.nan
    ok, _ = native.validate_fc32(iq)
    assert not ok


def test_stream_reader(tmp_path):
    rng = np.random.default_rng(1)
    x = (rng.standard_normal(10000) + 1j * rng.standard_normal(10000)).astype(
        np.complex64
    )
    p = tmp_path / "cap.dat"
    x.tofile(p)
    blocks = []
    with native.StreamReader(p, block_samples=1024, n_buffers=3) as r:
        for b in r:
            blocks.append(b)
    got = np.concatenate(blocks)
    np.testing.assert_array_equal(got, x)
    # 10000 samples in 1024-sample blocks -> 10 blocks, last partial
    assert len(blocks) == 10
    assert len(blocks[-1]) == 10000 - 9 * 1024


def test_stream_reader_fallback(tmp_path, monkeypatch):
    # force the pure-python path
    monkeypatch.setattr(native, "_load", lambda: None)
    x = np.arange(100, dtype=np.complex64)
    p = tmp_path / "cap.dat"
    x.tofile(p)
    with native.StreamReader(p, block_samples=32) as r:
        got = np.concatenate(list(r))
    np.testing.assert_array_equal(got, x)


def test_socket_reader_basic():
    """TCP IQ source: a sender thread pushes samples in odd-sized writes;
    the reader must reassemble them in order and stop at close."""
    import socket
    import threading

    if not native.available():
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(2)
    x = (rng.standard_normal(5000)
         + 1j * rng.standard_normal(5000)).astype(np.complex64)

    r = native.SocketReader(port=0, block_samples=512, n_buffers=4)

    def send():
        s = socket.create_connection(("127.0.0.1", r.port))
        raw = x.tobytes()
        for i in range(0, len(raw), 3001):  # deliberately unaligned writes
            s.sendall(raw[i : i + 3001])
        s.close()

    t = threading.Thread(target=send)
    t.start()
    got = np.concatenate(list(r))
    t.join()
    r.close()
    np.testing.assert_array_equal(got, x)


def test_socket_streaming_decode_end_to_end():
    """Live-ingest demo: a sender streams a 2-channel capture over TCP
    (interleaved like UHD's multi-channel wire), SocketReader feeds the
    streaming decoder, and decisions match the offline decode."""
    import socket
    import threading

    import jax.numpy as jnp

    from rub_mimo_tpu.config import tiny_config
    from rub_mimo_tpu.io import simulator
    from rub_mimo_tpu.pipeline import rx, streaming

    if not native.available():
        pytest.skip("native library unavailable")
    cfg = tiny_config(bit_exact=False)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=501, seed=11)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    cap = np.asarray(cap)
    ref = rx.decode(jnp.asarray(cap), cfg)
    assert bool(ref.synced)

    C = 512
    r = native.SocketReader(port=0, block_samples=C * cfg.num_streams,
                            n_buffers=8)

    def send():
        s = socket.create_connection(("127.0.0.1", r.port))
        inter = np.ascontiguousarray(cap.T)  # [T, S] sample-interleaved
        s.sendall(inter.tobytes())
        s.close()

    t = threading.Thread(target=send)
    t.start()
    dec = streaming.StreamingDecoder(cfg, chunk_size=C)
    for block in r:
        frame = block.reshape(-1, cfg.num_streams).T  # [S, n]
        chunk = np.zeros((cfg.num_streams, C), np.complex64)
        chunk[:, : frame.shape[1]] = frame
        dec.push(chunk)
    t.join()
    r.close()
    dec.finalize()
    assert dec.synced
    _, rx_data = dec.result()
    agree = (rx_data == np.asarray(ref.rx_data)).mean()
    assert agree > 0.999, agree
