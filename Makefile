# libdogleg_tpu build/verify contract — the analog of the reference's
# Makefile check target (reference Makefile:30-32), extended with the
# one-command evidence harness.

TAG ?=

.PHONY: check test evidence evidence-full

check:
	./check.sh

test:
	python -m pytest tests/ -x -q

# regenerate the quick-tier BENCH_* artifacts (<=10 min: headline +
# kernels-lite + multichip dryrun) + the EVIDENCE manifest; pass
# TAG=r05 to pin the round tag. `make evidence-full` runs the ~2.5 h
# full matrix.
evidence:
	python evidence.py $(if $(TAG),--tag $(TAG))

evidence-full:
	python evidence.py --full $(if $(TAG),--tag $(TAG))
