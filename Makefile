.PHONY: test test-full test-native test-tpu lint bench entry clean

test:            ## fast tests (skip slow pipeline tests)
	python -m pytest tests/ -q -m "not slow"

test-full:       ## everything incl. the full CLI pipeline, 10-min budget enforced
	timeout 600 python -m pytest tests/ -q || \
	  { rc=$$?; [ $$rc -eq 124 ] && echo "FAIL: suite exceeded the 600s budget"; exit $$rc; }

test-native:     ## native graphcore parity
	python -m pytest tests/test_native_graphcore.py -q

test-tpu:        ## hardware lane: kernels + bf16 numerics on the real chip
	EVI_TESTS_ON_TPU=1 python -m pytest tests/test_pallas_score.py \
	  tests/test_knn.py tests/test_serving_parity.py tests/test_hw_numerics.py \
	  tests/test_cli_serve.py -q

bench:           ## headline throughput benchmark (real TPU)
	python bench.py

entry:           ## driver entry checks
	python __graft_entry__.py

native:          ## build the C++ graphcore library
	g++ -O3 -march=native -shared -fPIC -std=c++17 native/graphcore.cpp -o native/libgraphcore.so

clean:
	rm -rf logs artifacts native/libgraphcore.so
