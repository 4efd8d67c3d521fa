# One-command round health check (VERDICT r4 item 8).
#
#   make verify   - oracle parity (sf0.01) -> plan audit -> bench (sf0.1)
#
# Individual stages:
#   make parity   - every registered query vs its DuckDB oracle
#   make plans    - regenerate PLANS.md (exchange/broadcast/codegen audit)
#   make bench    - min-of-2 headline benchmark, one JSON line
#   make test     - full pytest suite

SF_PARITY ?= /root/testdata/sf0.01
SF_PLANS  ?= /root/testdata/sf0.01
SF_BENCH  ?= /root/testdata/sf0.1

.PHONY: verify parity plans bench test

verify: parity plans bench

parity:
	SPARK_GRAFT_TEST_SF_DIR=$(SF_PARITY) python -m pytest tests/test_oracle_parity.py -q

plans:
	python -m updating_datasets_data_engineering_spark.plans.audit $(SF_PLANS)

bench:
	SPARK_GRAFT_SF_DIR=$(SF_BENCH) python bench.py

test:
	python -m pytest tests/ -x -q
