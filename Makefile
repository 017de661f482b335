# Developer entry points.

.PHONY: test sanitize bench native clean

test:
	python -m pytest tests/ -q

sanitize:
	bash salient_plusplus_tpu/native/run_sanitizers.sh

bench:
	python bench.py

native:
	python -c "from salient_plusplus_tpu.native.build import lib_path; print(lib_path(rebuild=True))"

clean:
	rm -f salient_plusplus_tpu/native/libsptpu.so
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null || true
