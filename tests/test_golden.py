"""Golden-file regression: replay a checked-in capture end-to-end.

The reference's offline re-decode of saved captures is its only
fixture-like mechanism (SURVEY §4, mimo/main.cc:906-922).  Here a small
recorded 2x2 capture (tests/golden/, with its manifest) is decoded and the
demodulated symbols + channel estimate are compared against checked-in
expectations — catching any semantic drift in the pipeline.
"""

from pathlib import Path

import numpy as np
import jax.numpy as jnp

from rub_mimo_tpu.io import capture as capio
from rub_mimo_tpu.pipeline import report, rx

GOLDEN = Path(__file__).parent / "golden"


def _load():
    manifest = capio.CaptureManifest.load(GOLDEN / "manifest.json")
    cap = capio.read_capture(GOLDEN, manifest.config.num_streams)
    return manifest.config, cap


def test_golden_decode_symbols():
    cfg, cap = _load()
    result = rx.decode(jnp.asarray(cap), cfg)
    expected = np.load(GOLDEN / "expected_rx_data.npy")
    np.testing.assert_array_equal(np.asarray(result.rx_data), expected)


def test_golden_channel_estimate():
    cfg, cap = _load()
    result = rx.decode(jnp.asarray(cap), cfg)
    expected = np.load(GOLDEN / "expected_G.npy")
    np.testing.assert_allclose(
        np.asarray(result.G), expected, rtol=1e-4, atol=1e-6
    )


def test_golden_ser_is_zero():
    cfg, cap = _load()
    tx_data = np.stack([
        capio.read_data(GOLDEN / f"tx_data{s + 1}.dat")
        for s in range(cfg.num_streams)
    ]).astype(np.int32)
    result = rx.decode(jnp.asarray(cap), cfg)
    rep = report.score(result, tx_data, cfg)
    assert rep.synced
    assert max(rep.symbol_error_rate) == 0.0


def test_golden_sharded_decode_matches():
    from rub_mimo_tpu.parallel import decode_sharded, mesh as mesh_mod

    cfg, cap = _load()
    expected = np.load(GOLDEN / "expected_rx_data.npy")
    m = mesh_mod.make_mesh(4, 1)
    iq = mesh_mod.shard_capture(jnp.asarray(cap), m)
    dec = decode_sharded.build_sharded_decoder(cfg, m, iq.shape[-1])
    got = dec(iq)
    np.testing.assert_array_equal(np.asarray(got.rx_data), expected)
