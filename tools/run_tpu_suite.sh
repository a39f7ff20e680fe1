#!/bin/bash
# Sequential TPU measurement suite (ONE tpu process at a time).
cd /root/repo
export PYTHONPATH="/root/repo:$PYTHONPATH"
echo "=== pallas_parity (writes PALLAS_PARITY.json)"
timeout 2400 python -u tools/pallas_parity.py 2>&1 | tail -3
echo "=== bench default (dupsort_tile dup=4, record kernel, unroll=20)"
timeout 2400 python -u bench.py 2>&1 | tail -1
echo "=== bench funnel (topk + sub-block)"
BENCH_COARSE=topk BENCH_SUB_BLOCK=4 timeout 2400 python -u bench.py 2>&1 | tail -1
echo "=== bench K=192"
BENCH_K=192 timeout 2400 python -u bench.py 2>&1 | tail -1
echo "=== gap probe (per-segment chained timings)"
timeout 3000 python -u tools/gap_probe.py 2>&1 | grep -v WARNING
echo "=== sort probe (primitive costs)"
timeout 2400 python -u tools/sort_probe.py 2>&1 | grep -v WARNING
echo "=== done"
