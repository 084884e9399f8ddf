# Development targets for fovvideovdp_tpu

PYTHON ?= python

.PHONY: test bench bench-grid goldens native clean dist

test:
	$(PYTHON) -m pytest tests/ -q

bench:
	$(PYTHON) bench.py

bench-grid:
	$(PYTHON) tools/benchmark_grid.py

# Regenerate golden fixtures by running the reference implementation
# (requires the reference repo; REFERENCE=/path/to/FovVideoVDP)
goldens:
	$(PYTHON) tools/gen_goldens.py

native:
	$(PYTHON) -c "from fovvideovdp_tpu import native; \
	  lib = native.load(); \
	  print('native library:', 'built' if lib else 'unavailable')"

dist:
	$(PYTHON) setup.py sdist bdist_wheel

clean:
	rm -rf build dist *.egg-info fovvideovdp_tpu/native/*.so \
	  .pytest_cache $$(find . -name __pycache__)
