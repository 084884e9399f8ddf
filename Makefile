# Development targets for fovvideovdp_tpu

PYTHON ?= python

.PHONY: test tpu-test bench bench-grid goldens native clean dist

test:
	$(PYTHON) -m pytest tests/ -q

# On-hardware tier: kernel-lowering parity, published-JOD goldens and e2e
# TPU tests on the real chip (run solo — nothing else may share the device).
# Appends a dated pass record to docs/tpu_test_log.txt on success.
tpu-test:
	$(PYTHON) -m pytest tests/ -q -m tpu | tee /tmp/tpu_test_out.txt
	@tail -1 /tmp/tpu_test_out.txt | grep -q "passed" && \
	  mkdir -p docs && \
	  echo "$$(date -u +%Y-%m-%dT%H:%MZ) $$($(PYTHON) -c 'import jax; print(jax.devices()[0].device_kind)') $$(tail -1 /tmp/tpu_test_out.txt)" \
	    >> docs/tpu_test_log.txt && \
	  echo "recorded in docs/tpu_test_log.txt"

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
