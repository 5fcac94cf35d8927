# Native components (also auto-built on first import; this target is for
# explicit/offline builds). Keep flags in sync with
# qcnn_tpu/native_build.py (the bindings' auto-build flag source).
CXX ?= g++
CXXFLAGS ?= -O3 -std=c++17 -shared -fPIC

NATIVE := qcnn_tpu/formats/native/libcbncodec.so \
          qcnn_tpu/preproc/native/libimgproc.so

all: $(NATIVE)

qcnn_tpu/formats/native/libcbncodec.so: qcnn_tpu/formats/native/cbncodec.cc
	$(CXX) $(CXXFLAGS) -o $@ $<

qcnn_tpu/preproc/native/libimgproc.so: qcnn_tpu/preproc/native/imgproc.cc
	$(CXX) $(CXXFLAGS) -pthread -o $@ $<

test:
	python -m pytest tests/ -q

lint:
	python tools/qlint.py

sanitize:
	python tools/native_sanitize.py

bench:
	python bench.py

clean:
	rm -f $(NATIVE)

.PHONY: all test lint sanitize bench clean
