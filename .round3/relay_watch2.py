import subprocess, sys, time, os
code = ("import jax, jax.numpy as jnp;"
        "print(int(jax.jit(lambda v: (v * 2).sum())(jnp.arange(8))))")
while True:
    t0 = time.time()
    try:
        r = subprocess.run([sys.executable, "-c", code], timeout=420, capture_output=True)
        ok = r.returncode == 0 and b"56" in r.stdout
    except subprocess.TimeoutExpired:
        ok = False
    print(f"{time.strftime('%H:%M:%S')} relay {'UP' if ok else 'down'} ({time.time()-t0:.0f}s)", flush=True)
    if ok:
        break
    time.sleep(120)
print("RELAY RECOVERED — launching campaign", flush=True)
os.execv("/bin/bash", ["/bin/bash", "/root/repo/.round3/tpu_campaign.sh"])
