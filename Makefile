# gadget_leicester_tpu build/test entry points

.PHONY: native test bench clean

native:
	cd native && python setup.py build_ext --inplace -q && \
	  cp gadget_native*.so ../gadget_leicester_tpu/ 2>/dev/null || true

test:
	python -m pytest tests/ -x -q

bench:
	python bench.py

clean:
	rm -rf native/build native/*.so gadget_leicester_tpu/gadget_native*.so
