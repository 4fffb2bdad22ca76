// recbox_native shard reader: multithreaded .npz shard IO with prefetch.
//
// The reference's block-streaming loader is Python h5py reads between
// blocks (`recbox/ranking/pytorch/dataloaders/h5_block_dataloader.py:26-118`)
// and its preprocessing fan-out is mp.Pool with pickled tmp files
// (`h5_generator.py:148-171`). This is the native runtime twin for the
// framework's .npz shard format (`recbox_tpu/data/shards.py`): a reader
// pool decodes whole shards off-thread into a bounded ring so the training
// loop never blocks on disk, exposed over a plain C ABI for ctypes (no
// pybind11 in this image).
//
// Format handled: numpy .npz = ZIP archive, STORE method (np.savez without
// compression), each member a .npy v1/v2 file. Little-endian dtypes
// <f4 <f8 <i4 <i8 |b1 |u1, C-order only — exactly what save_shards emits.

#include <atomic>
#include <cerrno>
#include <condition_variable>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <deque>
#include <memory>
#include <mutex>
#include <random>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Column {
  std::string name;     // without the .npy suffix
  std::string dtype;    // numpy descr, e.g. "<f4"
  std::vector<int64_t> shape;
  size_t data_off = 0;  // into Shard::file_buf (zero-copy on the C++ side)
  size_t nbytes = 0;
};

struct Shard {
  int64_t index = -1;             // position in the epoch order
  std::string path;
  std::vector<uint8_t> file_buf;  // whole archive; columns point into it
  std::vector<Column> columns;
  std::string error;              // non-empty on failure
};

// ---------------------------------------------------------------------------
// .npz (store-method zip) parsing
// ---------------------------------------------------------------------------

uint32_t rd32(const uint8_t* p) {
  return static_cast<uint32_t>(p[0]) | (static_cast<uint32_t>(p[1]) << 8) |
         (static_cast<uint32_t>(p[2]) << 16) |
         (static_cast<uint32_t>(p[3]) << 24);
}
uint16_t rd16(const uint8_t* p) {
  return static_cast<uint16_t>(p[0]) | (static_cast<uint16_t>(p[1]) << 8);
}

bool parse_npy(const uint8_t* buf, size_t n, Column* col, std::string* err) {
  if (n < 10 || std::memcmp(buf, "\x93NUMPY", 6) != 0) {
    *err = "bad npy magic";
    return false;
  }
  uint8_t major = buf[6];
  size_t header_len, header_off;
  if (major == 1) {
    header_len = rd16(buf + 8);
    header_off = 10;
  } else {  // v2/v3: 4-byte header length
    if (n < 12) { *err = "short npy v2 header"; return false; }
    header_len = rd32(buf + 8);
    header_off = 12;
  }
  if (header_off + header_len > n) { *err = "npy header overruns"; return false; }
  std::string h(reinterpret_cast<const char*>(buf + header_off), header_len);
  auto find_val = [&](const char* key) -> std::string {
    size_t p = h.find(key);
    if (p == std::string::npos) return "";
    p = h.find(':', p);
    return p == std::string::npos ? "" : h.substr(p + 1);
  };
  // descr
  std::string d = find_val("'descr'");
  size_t q0 = d.find('\'');
  size_t q1 = d.find('\'', q0 + 1);
  if (q0 == std::string::npos || q1 == std::string::npos) {
    *err = "npy descr missing";
    return false;
  }
  col->dtype = d.substr(q0 + 1, q1 - q0 - 1);
  // fortran_order must be False (save_shards writes C-order)
  std::string f = find_val("'fortran_order'");
  if (f.find("True") != std::string::npos) {
    *err = "fortran-order npy unsupported";
    return false;
  }
  // shape tuple
  std::string sh = find_val("'shape'");
  size_t l = sh.find('(');
  size_t r = sh.find(')', l);
  if (l == std::string::npos || r == std::string::npos) {
    *err = "npy shape missing";
    return false;
  }
  col->shape.clear();
  int64_t cur = -1;
  for (size_t i = l + 1; i < r; ++i) {
    char c = sh[i];
    if (c >= '0' && c <= '9') {
      cur = (cur < 0 ? 0 : cur) * 10 + (c - '0');
    } else if (c == ',' && cur >= 0) {
      col->shape.push_back(cur);
      cur = -1;
    }
  }
  if (cur >= 0) col->shape.push_back(cur);
  // 0-d scalars keep ndim 0: the binding reshapes to () like np.load
  size_t itemsize = 0;
  const std::string& dt = col->dtype;
  if (dt == "<f4" || dt == "<i4" || dt == "<u4") itemsize = 4;
  else if (dt == "<f8" || dt == "<i8" || dt == "<u8") itemsize = 8;
  else if (dt == "|b1" || dt == "|u1" || dt == "|i1") itemsize = 1;
  else if (dt == "<f2" || dt == "<i2" || dt == "<u2") itemsize = 2;
  else { *err = "unsupported dtype " + dt; return false; }
  size_t count = 1;
  for (int64_t s : col->shape) count *= static_cast<size_t>(s);
  col->nbytes = count * itemsize;
  col->data_off = header_off + header_len;   // relative to the npy start
  if (col->data_off + col->nbytes > n) {
    *err = "npy data overruns";
    return false;
  }
  return true;
}

bool read_npz(const std::string& path, Shard* shard) {
  FILE* fh = std::fopen(path.c_str(), "rb");
  if (!fh) {
    shard->error = "open failed: " + std::string(std::strerror(errno));
    return false;
  }
  std::fseek(fh, 0, SEEK_END);
  long size = std::ftell(fh);
  std::fseek(fh, 0, SEEK_SET);
  if (size < 0) {   // non-seekable path (FIFO): resize(-1) would throw
    std::fclose(fh);
    shard->error = "not a seekable file";
    return false;
  }
  std::vector<uint8_t>& buf = shard->file_buf;
  buf.resize(static_cast<size_t>(size));
  if (std::fread(buf.data(), 1, buf.size(), fh) != buf.size()) {
    std::fclose(fh);
    shard->error = "short read";
    return false;
  }
  std::fclose(fh);
  // walk local file headers sequentially (store-method zip)
  size_t off = 0;
  while (off + 30 <= buf.size()) {
    uint32_t sig = rd32(&buf[off]);
    if (sig != 0x04034b50) break;  // central directory reached
    uint16_t method = rd16(&buf[off + 8]);
    uint64_t comp_size = rd32(&buf[off + 18]);
    uint64_t raw_size = rd32(&buf[off + 22]);
    uint16_t name_len = rd16(&buf[off + 26]);
    uint16_t extra_len = rd16(&buf[off + 28]);
    if (off + 30 + static_cast<size_t>(name_len) +
            static_cast<size_t>(extra_len) > buf.size()) {
      // truncated archive (partial write): reading the name/extra region
      // would run past the file buffer
      shard->error = "truncated zip header";
      return false;
    }
    std::string name(reinterpret_cast<char*>(&buf[off + 30]), name_len);
    // numpy's savez always writes zip64 entries: the 32-bit size fields
    // hold 0xFFFFFFFF and the real sizes live in the 0x0001 extra record
    // (original size first, then compressed — only the 0xFFFFFFFF'd
    // fields are present, in that order)
    if (comp_size == 0xFFFFFFFFull || raw_size == 0xFFFFFFFFull) {
      size_t ex = off + 30 + name_len;
      size_t ex_end = ex + extra_len;
      while (ex + 4 <= ex_end) {
        uint16_t id = rd16(&buf[ex]);
        uint16_t sz = rd16(&buf[ex + 2]);
        if (id == 0x0001) {
          size_t p = ex + 4;
          auto rd64 = [&](size_t at) {
            uint64_t v = 0;
            for (int b = 7; b >= 0; --b)
              v = (v << 8) | buf[at + static_cast<size_t>(b)];
            return v;
          };
          if (raw_size == 0xFFFFFFFFull && p + 8 <= ex_end) {
            raw_size = rd64(p);
            p += 8;
          }
          if (comp_size == 0xFFFFFFFFull && p + 8 <= ex_end) {
            comp_size = rd64(p);
          }
          break;
        }
        ex += 4 + sz;
      }
    }
    size_t data_off = off + 30 + name_len + extra_len;
    if (method != 0) {
      shard->error = "compressed npz member " + name +
                     " (save_shards writes store-method archives)";
      return false;
    }
    if (data_off + comp_size > buf.size()) {
      shard->error = "zip member overruns: " + name;
      return false;
    }
    if (raw_size > comp_size) {
      // store-method entries have raw == comp; a corrupt zip64 extra with
      // raw > comp would let parse_npy validate offsets against a region
      // larger than the buffer actually holds
      shard->error = "zip64 size mismatch: " + name;
      return false;
    }
    Column col;
    if (name.size() > 4 && name.substr(name.size() - 4) == ".npy") {
      col.name = name.substr(0, name.size() - 4);
      std::string err;
      if (!parse_npy(&buf[data_off], raw_size, &col, &err)) {
        shard->error = name + ": " + err;
        return false;
      }
      col.data_off += data_off;   // now absolute into file_buf
      shard->columns.push_back(std::move(col));
    }
    off = data_off + comp_size;
  }
  if (shard->columns.empty()) {
    shard->error = "no npy members found";
    return false;
  }
  return true;
}

// ---------------------------------------------------------------------------
// reader pool: decode shards off-thread into an ordered bounded ring
// ---------------------------------------------------------------------------

struct Reader {
  std::vector<std::string> paths;   // epoch order (already shuffled by caller)
  size_t prefetch;
  std::vector<std::thread> threads;
  std::mutex mu;
  std::condition_variable cv_ready, cv_space;
  std::deque<std::unique_ptr<Shard>> ready;   // completed, any order
  std::atomic<int64_t> next_to_claim{0};
  int64_t next_to_emit = 0;                   // ordered delivery
  std::atomic<bool> stop{false};

  ~Reader() { shutdown(); }

  void shutdown() {
    stop.store(true);
    cv_space.notify_all();
    cv_ready.notify_all();
    for (auto& t : threads)
      if (t.joinable()) t.join();
    threads.clear();
  }

  void worker() {
    for (;;) {
      int64_t idx = next_to_claim.fetch_add(1);
      if (stop.load() || idx >= static_cast<int64_t>(paths.size())) return;
      auto shard = std::make_unique<Shard>();
      shard->index = idx;
      shard->path = paths[static_cast<size_t>(idx)];
      try {
        read_npz(shard->path, shard.get());
      } catch (const std::exception& e) {
        // bad_alloc/length_error must surface through rb_shard_error,
        // not std::terminate the whole training process
        shard->columns.clear();
        shard->error = std::string("decode exception: ") + e.what();
      }
      std::unique_lock<std::mutex> lk(mu);
      // bounded ring, ordered emission: hold until within the window
      cv_space.wait(lk, [&] {
        return stop.load() ||
               idx < next_to_emit + static_cast<int64_t>(prefetch);
      });
      if (stop.load()) return;
      ready.push_back(std::move(shard));
      cv_ready.notify_all();
    }
  }

  Shard* next() {
    std::unique_lock<std::mutex> lk(mu);
    for (;;) {
      for (auto it = ready.begin(); it != ready.end(); ++it) {
        if ((*it)->index == next_to_emit) {
          Shard* s = it->release();
          ready.erase(it);
          ++next_to_emit;
          cv_space.notify_all();
          return s;  // caller owns; free via rb_shard_free
        }
      }
      if (next_to_emit >= static_cast<int64_t>(paths.size())) return nullptr;
      if (stop.load()) return nullptr;
      cv_ready.wait(lk);
    }
  }
};

}  // namespace

extern "C" {

// Opens a reader over `n_paths` shard files in the GIVEN order with
// `n_threads` decoders and a `prefetch`-deep ordered ring. Returns an
// opaque handle (never null).
void* rb_shard_reader_open(const char** shard_paths, int n_paths,
                           int prefetch, int n_threads) {
  auto* r = new Reader();
  for (int i = 0; i < n_paths; ++i) r->paths.emplace_back(shard_paths[i]);
  r->prefetch = prefetch < 1 ? 1 : static_cast<size_t>(prefetch);
  int nt = n_threads < 1 ? 1 : n_threads;
  for (int i = 0; i < nt; ++i)
    r->threads.emplace_back([r] { r->worker(); });
  return r;
}

// Blocks until the next shard (in open order) is decoded. Returns an
// opaque shard handle, or null at end-of-epoch. On per-shard errors the
// shard handle is returned with n_columns == 0; rb_shard_error explains.
void* rb_shard_reader_next(void* reader) {
  return static_cast<Reader*>(reader)->next();
}

int rb_shard_n_columns(void* shard) {
  Shard* s = static_cast<Shard*>(shard);
  return s->error.empty() ? static_cast<int>(s->columns.size()) : 0;
}

const char* rb_shard_error(void* shard) {
  return static_cast<Shard*>(shard)->error.c_str();
}

const char* rb_shard_col_name(void* shard, int i) {
  return static_cast<Shard*>(shard)->columns[i].name.c_str();
}

const char* rb_shard_col_dtype(void* shard, int i) {
  return static_cast<Shard*>(shard)->columns[i].dtype.c_str();
}

int rb_shard_col_ndim(void* shard, int i) {
  return static_cast<int>(
      static_cast<Shard*>(shard)->columns[i].shape.size());
}

void rb_shard_col_shape(void* shard, int i, int64_t* out) {
  const auto& sh = static_cast<Shard*>(shard)->columns[i].shape;
  for (size_t d = 0; d < sh.size(); ++d) out[d] = sh[d];
}

const void* rb_shard_col_data(void* shard, int i) {
  Shard* s = static_cast<Shard*>(shard);
  return s->file_buf.data() + s->columns[i].data_off;
}

int64_t rb_shard_col_nbytes(void* shard, int i) {
  return static_cast<int64_t>(
      static_cast<Shard*>(shard)->columns[i].nbytes);
}

void rb_shard_free(void* shard) { delete static_cast<Shard*>(shard); }

void rb_shard_reader_close(void* reader) {
  delete static_cast<Reader*>(reader);
}

}  // extern "C"
