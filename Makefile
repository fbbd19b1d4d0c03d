.PHONY: install test test-fast bench docs clean

install:
	pip install -e ".[test]"

test:
	python -m pytest tests/ -v --cov=gpar_tpu --cov-report=term-missing

test-fast:
	python -m pytest tests/ -x -q

bench:
	python bench.py

bench-stress:
	python bench.py --stress

docs:
	$(MAKE) -C docs html

clean:
	rm -rf build dist *.egg-info .pytest_cache .coverage
	find . -name __pycache__ -type d -exec rm -rf {} +
