#!/bin/bash
# Sequential TPU measurement suite (ONE tpu process at a time).
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
echo "=== pallas_parity"
timeout 2400 python -u tools/pallas_parity.py 2>&1 | tail -4
echo "=== bench default (superblock coarse)"
timeout 2000 python -u bench.py 2>&1 | tail -1
echo "=== bench KB=2048"
BENCH_KB=2048 timeout 2000 python -u bench.py 2>&1 | tail -1
echo "=== bench K=192"
BENCH_K=192 timeout 2000 python -u bench.py 2>&1 | tail -1
echo "=== bench K=192 KB=2048"
BENCH_K=192 BENCH_KB=2048 timeout 2000 python -u bench.py 2>&1 | tail -1
echo "=== done"
