#!/bin/bash
# Self-arming TPU measurement battery: waits for the axon tunnel to
# recover, then runs the round-3 measurement set.
# Output: /tmp/battery.log
cd /root/repo
log=/tmp/battery.log
echo "[battery] armed $(date)" >> "$log"
while true; do
  if timeout 90 python -c "import jax; jax.devices()" >/dev/null 2>&1; then
    echo "[battery] tunnel UP $(date)" >> "$log"
    break
  fi
  echo "[battery] tunnel still down $(date)" >> "$log"
  sleep 240
done
echo "[battery] === _ab_sparse (zrun / zrun+raw / im2col) ===" >> "$log"
timeout 3000 python -u _ab_sparse.py >> "$log" 2>&1
echo "[battery] === sparse TPU-vs-CPU diff ===" >> "$log"
timeout 1200 python -u _verify_sparse_tpu.py tpu >> "$log" 2>&1
timeout 1200 python -u _verify_sparse_tpu.py cpu >> "$log" 2>&1
python - >> "$log" 2>&1 <<'EOF'
import numpy as np
t = np.load("/tmp/sparse_tpu.npy"); c = np.load("/tmp/sparse_cpu.npy")
print("sparse fwd TPU-vs-CPU max |diff|:", np.abs(t - c).max())
EOF
echo "[battery] === bench.py (f32 headline + b100 + bf16) ===" >> "$log"
timeout 1800 python bench.py >> "$log" 2>&1
echo "[battery] === bench_train.py ===" >> "$log"
timeout 1800 python bench_train.py >> "$log" 2>&1
echo "[battery] === bench_models f32 ===" >> "$log"
timeout 2400 python bench_models.py >> "$log" 2>&1
echo "[battery] === bench_models bf16 ===" >> "$log"
timeout 2400 python bench_models.py --precision bfloat16 >> "$log" 2>&1
echo "[battery] done $(date)" >> "$log"
