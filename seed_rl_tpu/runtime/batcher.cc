// Dynamic batching runtime for external (host-process) actors.
//
// TPU-native equivalent of the reference's C++ gRPC server batcher
// (/root/reference/grpc/ops/grpc.cc, DynamicFn :591-861): concurrent env
// threads submit fixed-size requests; each request is copied into a slot of
// a pre-allocated contiguous batch buffer (CopyElementToSlice semantics,
// grpc.cc:667-676); when a batch fills it is handed to a runner (the Python
// side executes the jitted policy on it, round-robin across inference
// shards); results are sliced back to the blocked callers
// (grpc.cc:714-756). Shutdown cancels blocked callers and runners
// (cancellation cascade, grpc.cc:381-397, 451-461).
//
// Differences from the reference: transport is in-process shared memory
// instead of gRPC streams (remote actors can sit behind any IPC in front of
// submit()), and an optional flush timeout fires partial batches (the
// reference only fires full batches and relies on inference_batch_size <=
// num_envs; partial firing makes draining robust).
//
// Exposed as a plain C API for ctypes; no Python.h dependency.

#include <atomic>
#include <chrono>
#include <condition_variable>
#include <cstdint>
#include <cstring>
#include <mutex>
#include <vector>

namespace {

struct Batch {
  std::vector<char> request_data;   // [batch_size * request_bytes]
  std::vector<char> result_data;    // [batch_size * result_bytes]
  std::vector<int64_t> env_ids;     // [batch_size]
  size_t fill = 0;                  // slots filled by submitters
  size_t done_waiters = 0;          // submitters that consumed their result
  uint64_t generation = 0;          // batch sequence number for this buffer
  bool queued = false;              // full (or flushed) and awaiting runner
  bool completed = false;           // results written by the runner
  bool failed = false;              // runner reported a handler error
};

}  // namespace

struct Batcher {
  size_t batch_size;
  size_t request_bytes;
  size_t result_bytes;
  size_t num_buffers;

  std::mutex mu;
  std::condition_variable submit_cv;   // space available / result ready
  std::condition_variable runner_cv;   // batch ready to run
  std::vector<Batch> buffers;
  size_t fill_index = 0;   // buffer currently accepting submissions
  size_t run_index = 0;    // next buffer to hand to a runner
  uint64_t next_generation = 1;
  bool shutdown = false;

  // Stats (reference exposes none; useful for perf work).
  std::atomic<uint64_t> total_requests{0};
  std::atomic<uint64_t> total_batches{0};

  Batcher(size_t bs, size_t req, size_t res, size_t nbuf)
      : batch_size(bs), request_bytes(req), result_bytes(res),
        num_buffers(nbuf), buffers(nbuf) {
    for (auto& b : buffers) {
      b.request_data.resize(bs * req);
      b.result_data.resize(bs * res);
      b.env_ids.resize(bs);
    }
    buffers[0].generation = next_generation++;
  }
};

extern "C" {

Batcher* batcher_create(size_t batch_size, size_t request_bytes,
                        size_t result_bytes, size_t num_buffers) {
  if (batch_size == 0 || num_buffers < 2) return nullptr;
  return new Batcher(batch_size, request_bytes, result_bytes, num_buffers);
}

void batcher_destroy(Batcher* b) { delete b; }

// Blocking submit from an env/actor thread. Copies `request` into a batch
// slot, waits for the batch's results, copies this slot's result out.
// Returns 0 on success, 1 on shutdown, 2 if the runner reported a handler
// failure for this batch (result_out is not written).
int batcher_submit(Batcher* b, int64_t env_id, const char* request,
                   char* result_out) {
  std::unique_lock<std::mutex> lock(b->mu);

  // Wait for a slot in the filling buffer.
  Batch* batch;
  size_t slot;
  uint64_t generation;
  size_t buffer_idx;
  while (true) {
    if (b->shutdown) return 1;
    batch = &b->buffers[b->fill_index];
    if (!batch->queued && batch->fill < b->batch_size) {
      slot = batch->fill++;
      generation = batch->generation;
      buffer_idx = b->fill_index;
      break;
    }
    // Current buffer is busy (queued or its results are being drained);
    // wait for space.
    b->submit_cv.wait(lock);
  }

  std::memcpy(batch->request_data.data() + slot * b->request_bytes, request,
              b->request_bytes);
  batch->env_ids[slot] = env_id;
  b->total_requests.fetch_add(1, std::memory_order_relaxed);

  if (batch->fill == b->batch_size) {
    // Full: queue for a runner and advance the fill pointer to the next
    // buffer if it is free.
    batch->queued = true;
    b->runner_cv.notify_all();
    size_t next = (b->fill_index + 1) % b->num_buffers;
    Batch* nb = &b->buffers[next];
    if (!nb->queued && nb->fill == 0 && !nb->completed) {
      nb->generation = b->next_generation++;
      b->fill_index = next;
      b->submit_cv.notify_all();
    }
  }

  // Wait for our batch's results.
  while (true) {
    Batch* cur = &b->buffers[buffer_idx];
    if (b->shutdown) return 1;
    if (cur->generation == generation && cur->completed) break;
    b->submit_cv.wait(lock);
  }

  Batch* cur = &b->buffers[buffer_idx];
  const bool failed = cur->failed;
  if (!failed) {
    std::memcpy(result_out, cur->result_data.data() + slot * b->result_bytes,
                b->result_bytes);
  }
  cur->done_waiters++;
  if (cur->done_waiters == cur->fill) {
    // Last waiter recycles the buffer.
    cur->fill = 0;
    cur->done_waiters = 0;
    cur->queued = false;
    cur->completed = false;
    cur->failed = false;
    Batch* fb = &b->buffers[b->fill_index];
    if (fb->queued || fb->completed) {
      // The filling pointer was stuck on a busy buffer; take over.
      cur->generation = b->next_generation++;
      b->fill_index = buffer_idx;
    }
    b->submit_cv.notify_all();
  }
  return failed ? 2 : 0;
}

// Runner side: wait for a queued batch (or flush a partial one after
// flush_timeout_ms; pass -1 to wait for full batches only). On success
// returns 0 and sets *request_data / *env_ids / *count / *ticket.
// Returns 1 on shutdown, 2 on timeout with nothing to run.
int batcher_get_batch(Batcher* b, char** request_data, int64_t** env_ids,
                      size_t* count, uint64_t* ticket,
                      int flush_timeout_ms) {
  std::unique_lock<std::mutex> lock(b->mu);
  auto deadline = std::chrono::steady_clock::now() +
                  std::chrono::milliseconds(
                      flush_timeout_ms < 0 ? 3600 * 1000 : flush_timeout_ms);
  while (true) {
    if (b->shutdown) return 1;
    Batch* batch = &b->buffers[b->run_index];
    if (batch->queued && !batch->completed) {
      *request_data = batch->request_data.data();
      *env_ids = batch->env_ids.data();
      *count = batch->fill;
      *ticket = b->run_index;
      b->run_index = (b->run_index + 1) % b->num_buffers;
      b->total_batches.fetch_add(1, std::memory_order_relaxed);
      return 0;
    }
    if (b->runner_cv.wait_until(lock, deadline) ==
        std::cv_status::timeout) {
      if (flush_timeout_ms >= 0 && batch == &b->buffers[b->fill_index] &&
          batch->fill > 0 && !batch->queued) {
        // Flush the partial batch.
        batch->queued = true;
        size_t next = (b->fill_index + 1) % b->num_buffers;
        Batch* nb = &b->buffers[next];
        if (!nb->queued && nb->fill == 0 && !nb->completed) {
          nb->generation = b->next_generation++;
          b->fill_index = next;
          b->submit_cv.notify_all();
        }
        continue;  // loop picks it up
      }
      return 2;
    }
  }
}

// Runner side: publish results for a batch obtained via batcher_get_batch.
// `results` must hold count * result_bytes bytes.
int batcher_complete_batch(Batcher* b, uint64_t ticket, const char* results,
                           size_t count) {
  std::unique_lock<std::mutex> lock(b->mu);
  if (ticket >= b->num_buffers) return 1;
  Batch* batch = &b->buffers[ticket];
  if (!batch->queued || batch->completed || batch->fill != count) return 1;
  std::memcpy(batch->result_data.data(), results, count * b->result_bytes);
  batch->completed = true;
  b->submit_cv.notify_all();
  return 0;
}

// Runner side: mark a batch as failed (handler raised). Every submitter
// blocked on it gets return code 2 from batcher_submit instead of a result
// — the error-propagation counterpart of the reference's server
// cancellation on handler errors (grpc.cc:381-397).
int batcher_fail_batch(Batcher* b, uint64_t ticket) {
  std::unique_lock<std::mutex> lock(b->mu);
  if (ticket >= b->num_buffers) return 1;
  Batch* batch = &b->buffers[ticket];
  if (!batch->queued || batch->completed) return 1;
  batch->completed = true;
  batch->failed = true;
  b->submit_cv.notify_all();
  return 0;
}

void batcher_shutdown(Batcher* b) {
  std::unique_lock<std::mutex> lock(b->mu);
  b->shutdown = true;
  b->submit_cv.notify_all();
  b->runner_cv.notify_all();
}

uint64_t batcher_total_requests(Batcher* b) {
  return b->total_requests.load(std::memory_order_relaxed);
}

uint64_t batcher_total_batches(Batcher* b) {
  return b->total_batches.load(std::memory_order_relaxed);
}

}  // extern "C"
