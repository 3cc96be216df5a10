#!/bin/sh
# Self-checking integration run, mirroring the reference's check.sh: the
# demo problem solved in every mode with --check (reference check.sh:11-15),
# plus the autodiff mode the reference doesn't have. f64 parity math runs on
# the CPU backend.
set -e
for mode in sparse dense dense-products-packed-upper dense-products-unpacked residual factored; do
    echo "== $mode =="
    python -m libdogleg_tpu.sample --check --platform cpu "$mode"
done
echo "ALL MODES OK"
