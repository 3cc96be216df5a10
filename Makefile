# libdogleg_tpu build/verify contract — the analog of the reference's
# Makefile check target (reference Makefile:30-32), extended with the
# one-command evidence harness.

TAG ?=

.PHONY: check test evidence

check:
	./check.sh

test:
	python -m pytest tests/ -x -q

# regenerate every BENCH_* artifact + the EVIDENCE manifest; pass
# TAG=r04 to pin the round tag
evidence:
	python evidence.py $(if $(TAG),--tag $(TAG))
