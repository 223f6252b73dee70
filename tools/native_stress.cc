// Concurrency stress for the native runtime, built for ThreadSanitizer.
//
// The reference delegates all thread safety to GNU Radio's single-writer
// circular buffers and ships no sanitizer configuration (SURVEY.md section 5
// "race detection: absent"). This framework's native runtime has real
// concurrency — the SPSC ring and the threaded pipeline executor — so this
// binary drives both under load; tools/tsan_check.sh compiles everything
// with -fsanitize=thread and fails on any reported race.
//
// Exit code 0 = all data validated; TSAN reports go to stderr and set the
// sanitizer's own exit code.

#include <atomic>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

extern "C" {
void* ring_create(size_t capacity);
void ring_destroy(void* h);
size_t ring_push(void* h, const uint8_t* data, size_t n);
size_t ring_pop(void* h, uint8_t* out, size_t n);
size_t ring_size(void* h);
void* pipe_create(size_t ring_capacity);
void pipe_destroy(void* h);
int pipe_start_file_source(void* h, const char* path, int repeats,
                           size_t align);
int pipe_start_bmp_sink(void* h, const char* path);
size_t pipe_pull(void* h, uint8_t* buf, size_t n, size_t min_bytes);
void pipe_push(void* h, const uint8_t* buf, size_t n);
void pipe_finish(void* h);
uint64_t pipe_bytes_in(void* h);
uint64_t pipe_bytes_out(void* h);
uint64_t pipe_images_written(void* h);
}

static int stress_ring() {
  // SPSC: one producer pushes a counting pattern, one consumer validates.
  const size_t kTotal = 8u << 20;  // 8 MiB through a 4 KiB ring
  void* r = ring_create(4096);
  std::atomic<bool> fail{false};

  std::thread producer([&] {
    std::vector<uint8_t> buf(1031);  // odd size -> wraps at all phases
    uint64_t sent = 0;
    while (sent < kTotal) {
      size_t want = std::min(buf.size(), (size_t)(kTotal - sent));
      for (size_t i = 0; i < want; i++) buf[i] = (uint8_t)((sent + i) * 131);
      size_t n = ring_push(r, buf.data(), want);
      sent += n;
      if (!n) std::this_thread::yield();
    }
  });
  std::thread consumer([&] {
    std::vector<uint8_t> buf(997);
    uint64_t got = 0;
    while (got < kTotal) {
      size_t n = ring_pop(r, buf.data(), buf.size());
      for (size_t i = 0; i < n; i++) {
        if (buf[i] != (uint8_t)((got + i) * 131)) {
          fail.store(true);
          return;
        }
      }
      got += n;
      if (!n) std::this_thread::yield();
    }
  });
  producer.join();
  consumer.join();
  ring_destroy(r);
  if (fail.load()) {
    std::fprintf(stderr, "ring stress: data corruption\n");
    return 1;
  }
  std::puts("ring stress: OK");
  return 0;
}

static int stress_pipeline(const char* bmp_path, const char* out_path) {
  // Full executor: source thread + this thread (identity stage) + sink
  // thread, with a deliberately tiny ring to force constant contention.
  void* p = pipe_create(2048);
  if (pipe_start_file_source(p, bmp_path, 16, 4) != 0) {
    std::fprintf(stderr, "pipeline stress: cannot open %s\n", bmp_path);
    pipe_destroy(p);
    return 1;
  }
  pipe_start_bmp_sink(p, out_path);
  std::vector<uint8_t> buf(773);
  for (;;) {
    size_t n = pipe_pull(p, buf.data(), buf.size(), 1);
    if (!n) break;
    pipe_push(p, buf.data(), n);
  }
  pipe_finish(p);
  uint64_t in = pipe_bytes_in(p), out = pipe_bytes_out(p);
  uint64_t imgs = pipe_images_written(p);
  pipe_destroy(p);
  if (in != out || imgs != 16) {
    std::fprintf(stderr,
                 "pipeline stress: bytes %llu->%llu images %llu (want 16)\n",
                 (unsigned long long)in, (unsigned long long)out,
                 (unsigned long long)imgs);
    return 1;
  }
  std::puts("pipeline stress: OK");
  return 0;
}

int main(int argc, char** argv) {
  if (argc < 3) {
    std::fprintf(stderr, "usage: %s <input.bmp> <out.bmp>\n", argv[0]);
    return 2;
  }
  int rc = stress_ring();
  rc |= stress_pipeline(argv[1], argv[2]);
  return rc;
}
