.PHONY: native test test-all bench clean

native:
	g++ -O3 -march=native -shared -fPIC \
	  -o native/libzukelang_native.so native/zukelang_native.cpp

test:
	python -m pytest tests/ -q

test-all:
	python -m pytest tests/ -q --runslow

bench:
	python bench.py

clean:
	rm -f native/libzukelang_native.so
	rm -rf .jax_cache
