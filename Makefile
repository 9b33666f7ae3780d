# Developer entry points (the reference ships a Makefile too)

.PHONY: test bench calibrate scale-bench sampling-bench lint examples

test:
	python -m pytest tests/ -q

bench:
	python bench.py

calibrate:
	python benchmarks/calibrate_gates.py --trials 30

scale-bench:
	python benchmarks/bench_ml10m_scale.py

sampling-bench:
	python benchmarks/bench_sampling.py

examples:
	COLLIE_TPU_SYNTHETIC_MOVIELENS=1 python examples/01_prepare_data.py
	COLLIE_TPU_SYNTHETIC_MOVIELENS=1 python examples/02_matrix_factorization.py
	COLLIE_TPU_SYNTHETIC_MOVIELENS=1 python examples/07_explicit_ratings.py
