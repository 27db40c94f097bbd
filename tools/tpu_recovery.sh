#!/bin/bash
# One-shot TPU-recovery sequence: after a tunnel outage, validate the
# current kernels compile and match on real hardware, capture a stage
# profile, and run the bench — in one serialized pass (the tunnel serves
# exactly one client; concurrent python processes deadlock at device init).
#
# Usage: bash tools/tpu_recovery.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/tpu_recovery.log}
: > "$LOG"

echo "=== device probe $(date) ===" | tee -a "$LOG"
timeout 90 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
  || { echo "TPU still unreachable" | tee -a "$LOG"; exit 1; }

echo "=== pallas-vs-reference parity on TPU ===" | tee -a "$LOG"
timeout 1200 python - >> "$LOG" 2>&1 <<'EOF'
import numpy as np, jax, jax.numpy as jnp
from msgs.core.camera import make_camera
from msgs.kernels.rasterize import RasterSettings, rasterize

rng = np.random.default_rng(7)
N = 20000
means = np.concatenate([rng.uniform(-3, 3, (N, 2)),
                        rng.uniform(2, 12, (N, 1))], 1).astype(np.float32)
scales = np.exp(rng.uniform(-4.5, -2.5, (N, 3))).astype(np.float32)
quats = rng.normal(size=(N, 4)).astype(np.float32)
opac = rng.uniform(0.2, 0.9, N).astype(np.float32)
cols = rng.uniform(0, 1, (N, 3)).astype(np.float32)
cam = make_camera(np.eye(3), np.zeros(3), 1.0, 0.8, 512, 384)
a = tuple(jnp.asarray(x) for x in (means, opac, cols, scales, quats))

def run(backend):
    s = RasterSettings(backend=backend, entry_cap=1 << 19)
    def loss(ms, op, co, sc, qu):
        o = rasterize(cam, ms, op, colors_precomp=co, scales=sc, quats=qu,
                      settings=s)
        return jnp.sum(o.image * o.image) + jnp.sum(o.image), o
    (l, o), g = jax.value_and_grad(loss, argnums=(0, 1, 2, 3, 4),
                                   has_aux=True)(*a)
    return l, o, g

lp, op_, gp = run("pallas")
lr, or_, gr = run("reference")
img = float(jnp.abs(op_.image - or_.image).max())
print("image maxdiff:", img)
assert img < 1e-4, img
for i, (p, r) in enumerate(zip(gp, gr)):
    m = float(jnp.abs(r).max())
    d = float(jnp.abs(p - r).max())
    print(f"grad[{i}] maxdiff {d:.3e} (max {m:.3e})")
    assert d <= 3e-5 * m + 1e-6, (i, d, m)
print("TPU PARITY OK")
EOF
grep -q "TPU PARITY OK" "$LOG" || { echo "PARITY FAILED — see $LOG"; exit 2; }
echo "parity ok" | tee -a "$LOG"

echo "=== stage profile ===" | tee -a "$LOG"
timeout 1800 python tools/profile_stages.py >> "$LOG" 2>&1

echo "=== bench ===" | tee -a "$LOG"
timeout 1800 python bench.py | tee -a "$LOG"

echo "=== done $(date) ===" | tee -a "$LOG"
