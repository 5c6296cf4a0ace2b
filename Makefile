# Round-end verification targets. `make sweep` is the gate that must pass
# before a round ends: full tests at sf0.01, the parity suite again at
# sf0.1 (catches magnitude-dependent bugs — decimal overflow past 2^53,
# window-order tie ambiguity — that sf0.01 cannot see), then the benchmark.

PY := python

.PHONY: test parity-sf01 parity-sf1 bench sweep

test:
	$(PY) -m pytest tests/ -x -q

parity-sf01:
	$(PY) -m pytest tests/test_parity.py -q

parity-sf1:
	SPARK_GRAFT_TEST_SF=/root/testdata/sf0.1 $(PY) -m pytest tests/test_parity.py -q

bench:
	$(PY) bench.py

sweep: test parity-sf1 bench
