# Convenience entry points (the package itself is pure pip/setuptools).

.PHONY: test tpu-check bench

# full suite on the virtual 8-device CPU mesh (default CI gate)
test:
	python -m pytest tests/ -x -q

# curated REAL-CHIP battery (~10-15 min): multiply battery, every Pallas
# kernel vs its XLA twin, complex emulation, exact filter, TAS, tensor
# contraction, C API typed sweep. Run before every perf commit; record
# the result in docs/performance.md ("On-chip battery" section).
tpu-check:
	DBCSR_TEST_PLATFORM=axon python -m pytest tests/ -m tpu_battery -q

# headline benchmark on the real chip (one JSON line)
bench:
	python bench.py
