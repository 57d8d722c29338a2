import time, sys, jax, jax.numpy as jnp, numpy as np
jax.config.update("jax_compilation_cache_dir", "/tmp/rub_mimo_jax_cache")
from rub_mimo_tpu.config import ModemConfig
from rub_mimo_tpu.io import simulator
from rub_mimo_tpu.sync import schmidl_cox
from rub_mimo_tpu.utils.transfer import to_host

cfg = ModemConfig(pid_max=1000, bit_exact=False)
spec = simulator.ChannelSpec(snr_db=30.0, delay=5000, seed=42)
capture, tx_data, _ = simulator.simulate_capture(cfg, spec)
x = jax.device_put(jnp.asarray(capture))

sum_fn = jax.jit(lambda a: jnp.sum(a))
def hard_sync(arr):
    np.asarray(to_host(sum_fn(arr.astype(jnp.float32))))

for which in sys.argv[1:]:
    f = jax.jit(lambda a, w=which: schmidl_cox.synchronize(a, cfg, impl=w))
    t0=time.time(); r = f(x); hard_sync(r.sync_index); c=time.time()-t0
    N=40
    t0=time.time()
    for _ in range(N):
        r = f(x)
    hard_sync(r.sync_index)
    dt=(time.time()-t0)/N*1e3
    print(f"{which}: sustained {dt:.3f} ms/run (compile {c:.1f}s) sync_index={int(np.asarray(to_host(r.sync_index)))}", flush=True)
