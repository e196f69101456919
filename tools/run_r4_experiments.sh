#!/bin/bash
# Sequential round-4 pending experiments (single TPU chip — no concurrency).
set -u
cd /root/repo
mkdir -p /tmp/r4exp
# NOTE: do not clobber PYTHONPATH — /root/.axon_site registers the axon
# TPU plugin; the tools sys.path.insert /root/repo themselves.
export PYTHONPATH="/root/repo:${PYTHONPATH:-}"
export JAX_COMPILATION_CACHE_DIR=/tmp/jax_bench_cache

echo "=== exp_mapper_dropped $(date +%T) ==="
timeout 1800 python tools/exp_mapper_dropped.py \
  > /tmp/r4exp/dropped.json 2> /tmp/r4exp/dropped.log
echo "dropped rc=$?"

echo "=== exp_loop_1k $(date +%T) ==="
timeout 7200 python tools/exp_loop_1k.py \
  > /tmp/r4exp/loop1k.json 2> /tmp/r4exp/loop1k.log
echo "loop1k rc=$?"

echo "=== exp_mapper_ate extended $(date +%T) ==="
ATE_SIZES=192,384 ATE_SEEDS=0,1,2,3,4,5,6,7 ATE_MODES=host,dev_vis \
timeout 10800 python tools/exp_mapper_ate.py \
  > /tmp/r4exp/ate_ext.json 2> /tmp/r4exp/ate_ext.log
echo "ate rc=$?"
echo "=== all done $(date +%T) ==="
