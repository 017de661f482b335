#!/bin/bash
# Sanitizer CI for the native sampler (SURVEY.md §5.2: the reference ships
# no sanitizer configs; this framework gates the C++ core on ASan/UBSan
# and TSan runs of sampler_test.cpp).
set -e
cd "$(dirname "$0")"

echo "== ASan + UBSan =="
g++ -O1 -g -std=c++17 -fsanitize=address,undefined -fno-omit-frame-pointer \
    sampler.cpp sampler_test.cpp -o /tmp/sptpu_asan_test
/tmp/sptpu_asan_test

echo "== TSan =="
g++ -O1 -g -std=c++17 -fsanitize=thread -fno-omit-frame-pointer \
    sampler.cpp sampler_test.cpp -o /tmp/sptpu_tsan_test
/tmp/sptpu_tsan_test

echo "sanitizers clean"
