"""Pipeline consistency matrix: offline == sharded == streaming.

One systematic sweep over feature combinations, asserting every pipeline
that supports a combination produces the offline decode's exact symbols.
Guards against the copy-drift class of bug the code review caught once
(mmse_auto_noise diverging off the offline path).
"""

import numpy as np
import jax.numpy as jnp
import pytest

from rub_mimo_tpu.config import CommMode, Detector, Modulation, tiny_config
from rub_mimo_tpu.io import simulator
from rub_mimo_tpu.parallel import decode_sharded, mesh as mesh_mod
from rub_mimo_tpu.pipeline import rx, streaming

CASES = {
    "zf": dict(bit_exact=False),
    "bit_exact": dict(bit_exact=True),
    "mmse_auto": dict(bit_exact=False, detector=Detector.MMSE,
                      mmse_auto_noise=True),
    "qam16": dict(bit_exact=False, modulation=Modulation.QAM16),
    "diversity": dict(bit_exact=False, mode=CommMode.RX_DIVERSITY,
                      siso_tx=0),
    "siso": dict(bit_exact=False, mode=CommMode.SISO),
    "cfo": dict(bit_exact=False, correct_cfo=True),
    "fallback_lowsnr": dict(bit_exact=False, sync_fallback=True),
    "track_phase": dict(bit_exact=False, track_phase=True),
    "alamouti": dict(bit_exact=False, mode=CommMode.ALAMOUTI),
}
SPECS = {
    "fallback_lowsnr": simulator.ChannelSpec(snr_db=10.0, delay=350,
                                             seed=13),
    "cfo": simulator.ChannelSpec(snr_db=35.0, delay=256, seed=31,
                                 cfo_subcarriers=0.08),
}
DEFAULT_SPEC = simulator.ChannelSpec(snr_db=35.0, delay=333, seed=7)
ALT_SPEC = simulator.ChannelSpec(snr_db=32.0, delay=601, seed=77)


@pytest.mark.slow
@pytest.mark.parametrize("alt", [False, True])
@pytest.mark.parametrize("name", list(CASES))
def test_offline_sharded_streaming_agree(name, alt):
    cfg = tiny_config(**CASES[name])
    spec = SPECS.get(name, ALT_SPEC if alt else DEFAULT_SPEC)
    cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
    ref = rx.decode(cap, cfg)
    assert bool(ref.synced), f"{name}: offline failed to sync"
    ref_data = np.asarray(ref.rx_data)

    # sharded (4-way time split)
    m = mesh_mod.make_mesh(4, 1)
    iq = mesh_mod.shard_capture(cap, m)
    dec = decode_sharded.build_sharded_decoder(cfg, m, iq.shape[-1])
    got = dec(iq)
    assert bool(got.synced), f"{name}: sharded failed to sync"
    np.testing.assert_array_equal(
        np.asarray(got.rx_data), ref_data, err_msg=f"sharded != offline: {name}"
    )

    # streaming (chunked)
    sdec = streaming.decode_stream(np.asarray(cap), cfg, chunk_size=256)
    sdec.finalize()
    assert sdec.synced, f"{name}: streaming failed to sync"
    _, s_data = sdec.result()
    if name == "cfo":
        # float CFO estimates differ in ulps between the chunked and
        # whole-capture paths; require decision agreement
        agree = (s_data == ref_data).mean()
        assert agree > 0.999, f"streaming vs offline ({name}): {agree}"
    else:
        np.testing.assert_array_equal(
            s_data, ref_data, err_msg=f"streaming != offline: {name}"
        )
