# One-command gates (r6 verdict #8). `make verify` chains pytest →
# sf0.01 parity → bench → sf1.0 scale parity and writes VERIFY.json.
.PHONY: verify verify-fast test parity bench scale

verify:
	python tools/verify_all.py

verify-fast:
	python tools/verify_all.py --fast

test:
	python -m pytest tests/ -q

parity:
	SPARK_GRAFT_TEST_SF_DIR=/root/testdata/sf0.01 \
	python -m pytest tests/test_oracle_parity.py -q

bench:
	python bench.py

scale:
	python bench_scale.py verify
