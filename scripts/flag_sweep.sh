#!/bin/bash
# Sequential XLA/libtpu compiler-option sweep through perf_probe.py (one
# tunnel holder at a time). Unknown flags fail fast — that's informative.
set -u
cd "$(dirname "$0")/.."
export PYTHONPATH=/root/repo:${PYTHONPATH:-}
OUT=${1:-/tmp/flag_sweep.jsonl}
: > "$OUT"
run() {
  echo "### $1" >> "$OUT"
  timeout 420 python scripts/perf_probe.py "$1" 2>&1 | tail -2 >> "$OUT"
}
run "opt:xla_tpu_enable_aggressive_loop_fusion_layout_opt=true"
run "opt:xla_tpu_use_bundle_aware_cost_model_for_fusions=true"
run "opt:xla_tpu_rwb_fusion=false"
run "opt:xla_tpu_licm_size_inflation_ratio=10"
run "opt:xla_tpu_enable_multi_level_nested_loop_fusion=true"
run "opt:xla_tpu_scoped_vmem_limit_kib=65536"
run "opt:xla_tpu_vector_load_fusion_window=2048"
run "opt:xla_tpu_enable_dot_strength_reduction=false"
echo DONE >> "$OUT"
