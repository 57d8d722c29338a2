"""apps.live_view: the streaming live view serves the page and reflects
decoder frames in its JSON snapshot (reference GUI function,
Interface/figure.cpp:4-28, whose Run button was a stub)."""

import json
import urllib.request

import numpy as np

from rub_mimo_tpu.config import tiny_config
from rub_mimo_tpu.apps.live_view import LiveView
from rub_mimo_tpu.io import simulator
from rub_mimo_tpu.pipeline import streaming


def test_live_view_serves_and_updates():
    cfg = tiny_config(bit_exact=False)
    view = LiveView(cfg, port=0)  # ephemeral port
    port = view.start()
    try:
        page = urllib.request.urlopen(
            f"http://127.0.0.1:{port}/", timeout=5).read().decode()
        assert "constellation" in page

        d0 = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/data.json", timeout=5).read())
        assert d0["n_frames"] == 0 and d0["phase"] == "seek"

        # run the real streaming decoder and feed the view
        spec = simulator.ChannelSpec(snr_db=35.0, delay=501, seed=11)
        cap, tx_data, _ = simulator.simulate_capture(cfg, spec)
        dec = streaming.StreamingDecoder(cfg, 1024)
        capn = np.asarray(cap)
        T = capn.shape[-1]
        nc = -(-T // 1024)
        padded = np.pad(capn, ((0, 0), (0, nc * 1024 - T)))
        for i in range(nc):
            out = dec.push(padded[:, i * 1024:(i + 1) * 1024])
            view.add_frames(out)
            view.set_status(phase=dec.phase, synced=bool(dec.synced),
                            sync_index=dec.sync_index)
        dec.finalize()
        view.set_status(phase="done", synced=bool(dec.synced))

        d1 = json.loads(urllib.request.urlopen(
            f"http://127.0.0.1:{port}/data.json", timeout=5).read())
        assert d1["synced"] is True
        assert d1["n_frames"] == cfg.pid_max
        assert d1["phase"] == "done"
        assert len(d1["constellations"]) == cfg.num_streams
        assert len(d1["constellations"][0]) > 0
        assert len(d1["time"][0]) == 2 * min(cfg.M_occupied, 512)

        # 404 for unknown paths
        try:
            urllib.request.urlopen(
                f"http://127.0.0.1:{port}/nope", timeout=5)
            assert False, "expected 404"
        except urllib.error.HTTPError as e:
            assert e.code == 404
    finally:
        view.stop()
