"""Tests for the liquid-dsp exact-table extraction bridge.

liquid-dsp is not installed in this environment (and there is no
network egress), so the extraction plumbing is tested against a
compiled mock libliquid exposing the same ABI
(liquid_getopt_str2mod / modem_create / modem_get_bps /
modem_modulate / modem_destroy) serving a known 32-point table; the
golden test then round-trips a capture modulated with the "liquid"
table through the full decode after install_liquid_arb32opt — the
liquid-recorded-capture parity path (mimo/main.cc:1203-1204) minus only
liquid's actual floats.
"""

import json
import shutil
import subprocess
import sys

import numpy as np
import pytest

from rub_mimo_tpu.ofdm import constellation, liquid_tables

MOCK_C = r"""
#include <stdlib.h>

/* 32 distinct, reproducible "liquid" points (NOT this repo's builtin
   optimized table): a 4x8 grid, unit-average-energy scaled. */
static float TAB[64];
static void fill(void) {
    static int done = 0;
    if (done) return;
    double e = 0.0;
    for (int s = 0; s < 32; s++) {
        double re = ((s % 8) - 3.5) / 2.0;
        double im = ((s / 8) - 1.5) / 1.0;
        TAB[2*s] = (float)re; TAB[2*s+1] = (float)im;
        e += re*re + im*im;
    }
    float g = (float)(1.0 / __builtin_sqrt(e / 32.0));
    for (int i = 0; i < 64; i++) TAB[i] *= g;
    done = 1;
}

int liquid_getopt_str2mod(const char* s) {
    /* arb32opt lives at some positive enum value; 0 = unknown */
    if (s && s[0]=='a' && s[1]=='r' && s[2]=='b' && s[3]=='3') return 47;
    return 0;
}
void* modem_create(int ms) {
    if (ms != 47) return 0;
    fill();
    return malloc(1);
}
unsigned int modem_get_bps(void* q) { (void)q; return 5; }
void modem_modulate(void* q, unsigned int s, float* out) {
    (void)q;
    out[0] = TAB[2*(s & 31)];
    out[1] = TAB[2*(s & 31) + 1];
}
void modem_destroy(void* q) { free(q); }
"""


@pytest.fixture(scope="module")
def mock_libliquid(tmp_path_factory):
    cc = shutil.which("cc") or shutil.which("gcc") or shutil.which("g++")
    if cc is None:
        pytest.skip("no C compiler")
    d = tmp_path_factory.mktemp("mockliquid")
    src = d / "mock_liquid.c"
    src.write_text(MOCK_C)
    so = d / "libliquid_mock.so"
    subprocess.run([cc, "-shared", "-fPIC", "-O2", "-o", str(so), str(src)],
                   check=True)
    return str(so)


@pytest.fixture(autouse=True)
def _restore_table():
    yield
    constellation.set_arb32opt_table(None)


def _expected_table():
    """Float-faithful replay of the mock's C arithmetic: re/im computed
    in double, stored to f32; energy accumulated in double from the
    DOUBLE values; gain narrowed to f32; the scale applied in f32."""
    s = np.arange(32)
    re = ((s % 8) - 3.5) / 2.0
    im = (s // 8) - 1.5
    tab = np.empty(64, np.float32)
    tab[0::2] = re
    tab[1::2] = im
    e = np.sum(re * re + im * im)
    g = np.float32(1.0 / np.sqrt(e / 32.0))
    tab = tab * g  # f32 * f32
    return tab.view(np.complex64)


def test_not_found_is_clean():
    with pytest.raises(liquid_tables.LiquidNotFound):
        liquid_tables._open_libliquid("/nonexistent/libliquid.so")


def test_extract_exact_floats(mock_libliquid):
    pts = liquid_tables.extract_modem_table("arb32opt", mock_libliquid)
    assert pts.shape == (32,)
    assert pts.dtype == np.complex64
    exp = _expected_table()
    # extraction must be float-exact (both sides computed in f32)
    assert np.array_equal(pts.view(np.float32), exp.view(np.float32))


def test_unknown_scheme_raises(mock_libliquid):
    with pytest.raises(liquid_tables.LiquidNotFound):
        liquid_tables.extract_modem_table("nonsense", mock_libliquid)


def test_install_and_decode_golden(mock_libliquid):
    """Golden parity path: a capture whose payload was modulated with the
    'liquid' table decodes symbol-exactly once the extracted table is
    installed — and mis-decodes against the builtin table (proving the
    install matters)."""
    import jax.numpy as jnp

    from rub_mimo_tpu.config import Modulation, tiny_config
    from rub_mimo_tpu.io import simulator
    from rub_mimo_tpu.pipeline import rx

    pts = liquid_tables.extract_modem_table("arb32opt", mock_libliquid)
    constellation.set_arb32opt_table(pts)

    cfg = tiny_config(modulation=Modulation.ARB32OPT, pid_max=6)
    spec = simulator.ChannelSpec(snr_db=35.0, delay=300, seed=42)
    capture, tx_data, _ = simulator.simulate_capture(cfg, spec)
    res = rx.decode(jnp.asarray(capture), cfg)
    assert bool(res.synced)
    n = cfg.pid_max * cfg.M_occupied
    errs = int((np.asarray(res.rx_data)[:, :n] != tx_data[:, :n]).sum())
    assert errs == 0

    # same capture, builtin table: symbol indices must NOT all match
    constellation.set_arb32opt_table(None)
    res2 = rx.decode(jnp.asarray(capture), cfg)
    errs2 = int((np.asarray(res2.rx_data)[:, :n] != tx_data[:, :n]).sum())
    assert errs2 > 0


def test_extraction_script_writes_table(mock_libliquid, tmp_path):
    out = tmp_path / "tab.json"
    p = subprocess.run(
        [sys.executable, "scripts/extract_liquid_arb32opt.py",
         "-o", str(out), "--lib", mock_libliquid],
        capture_output=True, text=True, cwd="/root/repo",
    )
    assert p.returncode == 0, p.stderr
    arr = np.asarray(json.loads(out.read_text()), dtype=np.float32)
    assert arr.shape == (32, 2)
    loaded = constellation.load_arb32opt_table(out)
    exp = _expected_table()
    assert np.array_equal(loaded.view(np.float32), exp.view(np.float32))
