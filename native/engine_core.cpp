// Native engine core: paged-KV block allocator + per-step metadata assembly.
//
// C++ counterpart of the host-side hot path that the reference implements in
// Python (engine/block_manager.py, the slot/position loops of
// engine/model_runner/base.py:172-234). The Python implementations in
// nano_qwen3tts_tpu/engine/ remain the semantics oracle; this library is a
// drop-in accelerator for large block counts / batch sizes, bound via ctypes
// (engine/native_bridge.py). Exact-equivalence tests:
// tests/test_native_core.py.
//
// Build: make -C native   (g++ -O2 -shared -fPIC)

#include <cstdint>
#include <cstring>
#include <deque>
#include <vector>

namespace {

struct Block {
  int32_t ref_count = 0;
};

struct Core {
  int32_t num_blocks;
  int32_t block_size;
  std::vector<Block> blocks;
  // FIFO free list, matching the Python deque semantics (popleft from the
  // front, append returns to the back).
  std::deque<int32_t> free_list;
};

}  // namespace

extern "C" {

void* ec_create(int32_t num_blocks, int32_t block_size) {
  if (num_blocks <= 1 || block_size <= 0) return nullptr;
  Core* c = new Core();
  c->num_blocks = num_blocks;
  c->block_size = block_size;
  c->blocks.resize(num_blocks);
  // Block 0 reserved as the garbage block (engine/block_manager.py).
  for (int32_t i = 1; i < num_blocks; ++i) c->free_list.push_back(i);
  return c;
}

void ec_destroy(void* h) { delete static_cast<Core*>(h); }

int32_t ec_num_free(void* h) {
  return static_cast<int32_t>(static_cast<Core*>(h)->free_list.size());
}

// Allocate blocks for a prefill of num_tokens. Writes block ids into
// out_table (capacity >= ceil(num_tokens/block_size)). Returns the number of
// blocks, or -1 if not enough free blocks.
int32_t ec_allocate_prefill(void* h, int32_t num_tokens, int32_t* out_table) {
  Core* c = static_cast<Core*>(h);
  int32_t n = (num_tokens + c->block_size - 1) / c->block_size;
  if (n > static_cast<int32_t>(c->free_list.size())) return -1;
  for (int32_t i = 0; i < n; ++i) {
    int32_t id = c->free_list.front();
    c->free_list.pop_front();
    c->blocks[id].ref_count = 1;
    out_table[i] = id;
  }
  return n;
}

// True if a decode write at slot kv_len can proceed (a free block exists if
// the write crosses a block boundary).
int32_t ec_can_append(void* h, int32_t kv_len, int32_t table_len) {
  Core* c = static_cast<Core*>(h);
  bool needs = (kv_len % c->block_size == 0) && (kv_len / c->block_size >= table_len);
  return (!needs || !c->free_list.empty()) ? 1 : 0;
}

// Extend the table if the next write crosses a boundary. Returns the new
// table length (unchanged if no block was needed), or -1 on exhaustion.
int32_t ec_may_append(void* h, int32_t kv_len, int32_t* table, int32_t table_len) {
  Core* c = static_cast<Core*>(h);
  bool needs = (kv_len % c->block_size == 0) && (kv_len / c->block_size >= table_len);
  if (!needs) return table_len;
  if (c->free_list.empty()) return -1;
  int32_t id = c->free_list.front();
  c->free_list.pop_front();
  c->blocks[id].ref_count = 1;
  table[table_len] = id;
  return table_len + 1;
}

// Deallocate a table (reverse order, ref-counted) and clear it.
void ec_deallocate(void* h, int32_t* table, int32_t table_len) {
  Core* c = static_cast<Core*>(h);
  for (int32_t i = table_len - 1; i >= 0; --i) {
    Block& b = c->blocks[table[i]];
    if (--b.ref_count == 0) c->free_list.push_back(table[i]);
  }
}

void ec_add_ref(void* h, int32_t block_id) {
  static_cast<Core*>(h)->blocks[block_id].ref_count++;
}

// ---------------------------------------------------------------------------
// Batched per-step metadata assembly (the per-frame Python loops of
// Runner.run_decode / run_prefill).
// ---------------------------------------------------------------------------

// Flat KV slots for a prefill: positions 0..num_tokens-1 through the table.
void ec_prefill_slots(const int32_t* table, int32_t num_tokens,
                      int32_t block_size, int32_t* out_slots) {
  for (int32_t t = 0; t < num_tokens; ++t) {
    out_slots[t] = table[t / block_size] * block_size + t % block_size;
  }
}

// Decode-step metadata for B sequences. Inputs are arrays of length B
// (kv_lens = current kv length per seq) plus a row-major [B, max_nt] block
// table matrix with per-row lengths. Outputs: positions (kv_len+1 — the
// reference's decode off-by-one), slots, attention kv_lens (kv_len+1).
void ec_decode_metadata(const int32_t* kv_lens, const int32_t* tables,
                        const int32_t* table_lens, int32_t B, int32_t max_nt,
                        int32_t block_size, int32_t* out_positions,
                        int32_t* out_slots, int32_t* out_attn_lens) {
  for (int32_t i = 0; i < B; ++i) {
    int32_t kv = kv_lens[i];
    out_positions[i] = kv + 1;
    int32_t blk = tables[i * max_nt + kv / block_size];
    out_slots[i] = blk * block_size + kv % block_size;
    out_attn_lens[i] = kv + 1;
    (void)table_lens;
  }
}

}  // extern "C"
