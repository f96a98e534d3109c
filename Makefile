# Top-level build: native host runtime + tests + bench.

.PHONY: all native test bench demo clean

all: native

native:
	$(MAKE) -C runtime_cc

test: native
	python -m pytest tests/ -q

bench: native
	python bench.py

demo: native
	python -m grid_vision_tpu.demo --cpu --steps 20 --out demo_out

clean:
	$(MAKE) -C runtime_cc clean
	rm -rf demo_out
