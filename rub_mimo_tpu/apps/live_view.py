"""Live constellation / time-series view for the streaming decoder.

Closes the reference GUI's intended function (Interface/mainwindow.ui:
four constellation + four time plots updating as the run progresses,
figure.cpp:4-28, mainwindow.cpp:24-31 — whose Run button was never
wired, mainwindow.cpp:332-337): a zero-dependency HTTP server renders an
auto-refreshing page whose plots are drawn client-side (canvas) from a
JSON snapshot the decoder updates as frames arrive.

Usage (library):

    view = LiveView(cfg, port=8000)
    view.start()
    dec = StreamingDecoder(cfg, chunk)
    for chunk in source:
        for k, frame in dec.push(chunk):
            view.add_frames([(k, frame)])
        view.set_status(phase=dec.phase, synced=dec.synced)
    view.stop()

CLI demo (replays a capture through the streaming decoder):

    python -m rub_mimo_tpu.apps.live_view <capture_dir> [--port 8000]
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from typing import Iterable, Optional, Tuple

import numpy as np

from rub_mimo_tpu.config import ModemConfig

_PAGE = """<!DOCTYPE html>
<html><head><title>rub-mimo-tpu live</title><style>
body { font-family: sans-serif; background: #111; color: #ddd; }
canvas { background: #181818; border: 1px solid #333; margin: 4px; }
h1 { font-size: 16px; } .row { white-space: nowrap; }
#status { color: #8c8; font-family: monospace; }
</style></head><body>
<h1>rub-mimo-tpu live decoder</h1>
<div id="status">waiting for data...</div>
<div class="row" id="consts"></div>
<div class="row" id="times"></div>
<script>
function draw(d) {
  document.getElementById("status").textContent =
    `phase=${d.phase} synced=${d.synced} frames=${d.n_frames}` +
    (d.sync_index !== null ? ` sync_index=${d.sync_index}` : "") +
    (d.cfo_hat !== null ? ` cfo=${Number(d.cfo_hat).toFixed(5)}` : "");
  const S = d.constellations.length;
  const cdiv = document.getElementById("consts");
  const tdiv = document.getElementById("times");
  while (cdiv.children.length < S) {
    for (const div of [cdiv, tdiv]) {
      const c = document.createElement("canvas");
      c.width = 280; c.height = 280; div.appendChild(c);
    }
  }
  for (let s = 0; s < S; s++) {
    const c = cdiv.children[s], g = c.getContext("2d");
    g.clearRect(0, 0, c.width, c.height);
    g.fillStyle = "#6cf";
    const pts = d.constellations[s];
    const lim = d.lim || 2;
    for (let i = 0; i < pts.length; i += 2) {
      const x = (pts[i] / lim + 1) * c.width / 2;
      const y = (1 - pts[i+1] / lim) * c.height / 2;
      g.fillRect(x, y, 2, 2);
    }
    g.fillStyle = "#888";
    g.fillText(`stream ${s} constellation`, 6, 12);
    const t = tdiv.children[s], h = t.getContext("2d");
    h.clearRect(0, 0, t.width, t.height);
    const tr = d.time[s];
    h.strokeStyle = "#fc6"; h.beginPath();
    for (let i = 0; i < tr.length; i += 2) {
      const x = (i / 2) / (tr.length / 2) * t.width;
      const y = (1 - tr[i] / lim) * t.height / 2;
      if (i === 0) h.moveTo(x, y); else h.lineTo(x, y);
    }
    h.stroke();
    h.strokeStyle = "#6f6"; h.beginPath();
    for (let i = 1; i < tr.length; i += 2) {
      const x = ((i-1) / 2) / (tr.length / 2) * t.width;
      const y = (1 - tr[i] / lim) * t.height / 2;
      if (i === 1) h.moveTo(x, y); else h.lineTo(x, y);
    }
    h.stroke();
    h.fillStyle = "#888";
    h.fillText(`stream ${s} re/im (latest frame)`, 6, 12);
  }
}
async function tick() {
  try {
    const r = await fetch("/data.json");
    if (r.ok) draw(await r.json());
  } catch (e) {}
  setTimeout(tick, 500);
}
tick();
</script></body></html>
"""


class LiveView:
    """Holds the latest decoder snapshot and serves it over HTTP."""

    def __init__(self, cfg: ModemConfig, port: int = 8000,
                 max_points: int = 4000):
        self.cfg = cfg
        self.port = port
        self.max_points = max_points
        self._lock = threading.Lock()
        self._const = [np.zeros((0,), np.complex64)
                       for _ in range(cfg.num_streams)]
        self._latest: Optional[np.ndarray] = None  # [S, m_occ]
        self._status = {"phase": "seek", "synced": False,
                        "sync_index": None, "cfo_hat": None}
        self._n_frames = 0
        self._srv: Optional[ThreadingHTTPServer] = None
        self._thread: Optional[threading.Thread] = None

    # ---- decoder-side API ----
    def add_frames(self, frames: Iterable[Tuple[int, np.ndarray]]) -> None:
        with self._lock:
            for _, frame in frames:
                f = np.asarray(frame)
                self._latest = f
                self._n_frames += 1
                for s in range(self.cfg.num_streams):
                    cat = np.concatenate([self._const[s], f[s]])
                    self._const[s] = cat[-self.max_points:]

    def set_status(self, **kv) -> None:
        with self._lock:
            self._status.update(kv)

    def snapshot_json(self) -> bytes:
        with self._lock:
            lim = 1.0
            consts = []
            for c in self._const:
                if c.size:
                    lim = max(lim, float(np.abs(c).max()))
                consts.append(
                    np.stack([c.real, c.imag], -1).reshape(-1)
                    .astype(np.float32).round(4).tolist()
                )
            times = []
            for s in range(self.cfg.num_streams):
                if self._latest is not None:
                    t = self._latest[s][:512]
                    times.append(
                        np.stack([t.real, t.imag], -1).reshape(-1)
                        .astype(np.float32).round(4).tolist()
                    )
                else:
                    times.append([])
            d = dict(self._status)
            d.update({"constellations": consts, "time": times,
                      "n_frames": self._n_frames, "lim": round(lim, 3)})
        return json.dumps(d).encode()

    # ---- server ----
    def start(self) -> int:
        view = self

        class Handler(BaseHTTPRequestHandler):
            def do_GET(self):  # noqa: N802 (stdlib API)
                if self.path in ("/", "/index.html"):
                    body = _PAGE.encode()
                    ctype = "text/html"
                elif self.path == "/data.json":
                    body = view.snapshot_json()
                    ctype = "application/json"
                else:
                    self.send_response(404)
                    self.end_headers()
                    return
                self.send_response(200)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.end_headers()
                self.wfile.write(body)

            def log_message(self, *a):  # quiet
                pass

        self._srv = ThreadingHTTPServer(("127.0.0.1", self.port), Handler)
        self.port = self._srv.server_address[1]  # resolves port=0
        self._thread = threading.Thread(
            target=self._srv.serve_forever, daemon=True
        )
        self._thread.start()
        return self.port

    def stop(self) -> None:
        if self._srv is not None:
            self._srv.shutdown()
            self._srv.server_close()
            self._srv = None


def main(argv=None) -> int:
    import argparse
    import time

    ap = argparse.ArgumentParser(
        description="replay a capture through the streaming decoder with "
                    "a live constellation view")
    ap.add_argument("capture_dir", help="directory with rx{1,2}.dat")
    ap.add_argument("--port", type=int, default=8000)
    ap.add_argument("--chunk", type=int, default=1 << 16)
    ap.add_argument("--rate", type=float, default=2e6,
                    help="simulated arrival rate (samples/s aggregate); "
                         "0 = as fast as possible")
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--config", type=str, default=None,
                    help="ModemConfig JSON (else manifest.json / default)")
    args = ap.parse_args(argv)

    import jax

    if args.cpu:
        jax.config.update("jax_platforms", "cpu")

    from pathlib import Path

    from rub_mimo_tpu.io import capture as capture_mod
    from rub_mimo_tpu.pipeline import streaming

    if args.config:
        cfg = ModemConfig.from_json(Path(args.config).read_text())
    else:
        manifest = Path(args.capture_dir) / "manifest.json"
        if manifest.exists():
            cfg = capture_mod.CaptureManifest.load(manifest).config
        else:
            cfg = ModemConfig()
    cap = capture_mod.read_capture(args.capture_dir, cfg.num_streams)
    view = LiveView(cfg, port=args.port)
    port = view.start()
    print(f"live view: http://127.0.0.1:{port}/  (ctrl-c to stop)")

    dec = streaming.StreamingDecoder(cfg, args.chunk)
    T = cap.shape[-1]
    nc = -(-T // args.chunk)
    padded = np.pad(np.asarray(cap), ((0, 0), (0, nc * args.chunk - T)))
    try:
        for i in range(nc):
            t0 = time.perf_counter()
            out = dec.push(padded[:, i * args.chunk:(i + 1) * args.chunk])
            view.add_frames(out)
            view.set_status(
                phase=dec.phase, synced=bool(dec.synced),
                sync_index=dec.sync_index,
                cfo_hat=float(dec.cfo_hat) if dec.cfo_hat else None,
            )
            if args.rate > 0:
                budget = args.chunk * cfg.num_streams / args.rate
                dt = time.perf_counter() - t0
                if dt < budget:
                    time.sleep(budget - dt)
        dec.finalize()
        view.set_status(phase="done", synced=bool(dec.synced))
        print("replay done; serving final state (ctrl-c to exit)")
        while True:
            time.sleep(1)
    except KeyboardInterrupt:
        pass
    finally:
        view.stop()
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
