.PHONY: install test test-quick test-fast bench docs clean

install:
	pip install -e ".[test]"

test:
	python -m pytest tests/ -v --cov=gpar_tpu --cov-report=term-missing

# The iteration tier: everything not marked `heavy` (the multi-minute
# mesh/bucket oracles run in `make test` / CI's full job).
test-quick:
	python -m pytest tests/ -q -m quick

test-fast:
	python -m pytest tests/ -x -q

bench:
	python bench.py

bench-stress:
	python bench.py --stress

bench-serve:
	python bench.py --serve

docs:
	$(MAKE) -C docs html

clean:
	rm -rf build dist *.egg-info .pytest_cache .coverage
	find . -name __pycache__ -type d -exec rm -rf {} +
