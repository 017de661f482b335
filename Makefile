# Developer entry points.

.PHONY: test sanitize bench native clean ogb-products products-drill

# Real-data pipeline: download pre-partitioned OGB data (egress needed;
# fails fast with an actionable message otherwise), then train + score
# distributed against the BASELINE.md anchor.
ogb-products:
	python -m salient_plusplus_tpu.utils.download_datasets ogbn-products 8 --out datasets
	python -m salient_plusplus_tpu.driver ogbn-products-reordered-k8 ogb_products \
	    --dataset_root datasets --distribute_data true --epochs 25 \
	    --final_test_mode layerwise

# Everything AFTER the download gate, proven at products scale on
# synthetic data in the real on-disk format (peak RSS recorded per stage).
products-drill:
	python -m salient_plusplus_tpu.utils.readiness_drill \
	    --nodes 2450000 --parts 8 --epochs 3 --out docs/products_drill.json

# parallel by default: 14.4 -> 7.5 min on a 4-core host (pytest-xdist);
# use `make test-seq` when debugging worker-interleaved output.
# Tests marked `serial` assert wall-clock bounds on multi-process
# measurement legs — under xdist they measure core contention, not the
# code (round-4 red suite) — so they run in a second, sequential pass.
test:
	python -m pytest tests/ -q -n auto -m "not serial"
	python -m pytest tests/ -q -m serial

test-seq:
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
