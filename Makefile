# Convenience targets.
.PHONY: test bench native dryrun clean

test:
	python -m pytest tests/ -q

bench:
	python bench.py

native:
	cmake -S ngp_tpu/native -B build/native -G Ninja && cmake --build build/native
	cp build/native/libngpdata.so ngp_tpu/native/

dryrun:
	python __graft_entry__.py

clean:
	rm -rf build ngp_tpu/native/libngpdata.so
	find . -name __pycache__ -type d -exec rm -rf {} +
