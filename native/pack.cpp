// Native bulk record packer for the index pack tail.
//
// The reference packs records on its dump-processor hot path in Rust
// (dump_processor.rs:463-569, records are msgpack maps padded to
// 4096 B). Our Python loop costs ~63 us/record — ~10 min at 1e7 and
// ~105 min at the 1e8 design point, all GIL-bound — so the per-record
// encode moves behind one C call over whole batches. Byte-exactness
// with msgpack.packb (msgpack-python 1.x, use_bin_type=True) is locked
// by a randomized parity test (tests/test_disk_pipeline.py) covering
// the integer-width, string-width and array-width breakpoints and the
// oversize-URL dead-record path (dump_processor.rs:510-517).
//
// Layout contract (all little-endian host buffers, C-contiguous):
//   vectors: nrec rows of vec_nbytes raw fp16 payload
//   verts/shards: padded int32 matrices with per-row counts
//   urls: concatenated UTF-8 with nrec+1 int64 offsets
//   out: nrec * pad_size bytes — [u32 LE body len][msgpack body][zeros]
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Cur {
  uint8_t* p;
};

inline void put8(Cur& c, uint8_t v) { *c.p++ = v; }

inline void putn(Cur& c, const void* src, size_t n) {
  memcpy(c.p, src, n);
  c.p += n;
}

inline void be16(Cur& c, uint16_t v) {
  put8(c, v >> 8);
  put8(c, v & 0xff);
}

inline void be32(Cur& c, uint32_t v) {
  put8(c, v >> 24);
  put8(c, (v >> 16) & 0xff);
  put8(c, (v >> 8) & 0xff);
  put8(c, v & 0xff);
}

inline void be64(Cur& c, uint64_t v) {
  for (int i = 7; i >= 0; --i) put8(c, (v >> (8 * i)) & 0xff);
}

// msgpack minimal-width int, matching msgpack-python's Packer
void pack_int(Cur& c, int64_t v) {
  if (v >= 0) {
    if (v < 128) {
      put8(c, (uint8_t)v);
    } else if (v <= 0xff) {
      put8(c, 0xcc);
      put8(c, (uint8_t)v);
    } else if (v <= 0xffff) {
      put8(c, 0xcd);
      be16(c, (uint16_t)v);
    } else if (v <= 0xffffffffLL) {
      put8(c, 0xce);
      be32(c, (uint32_t)v);
    } else {
      put8(c, 0xcf);
      be64(c, (uint64_t)v);
    }
  } else {
    if (v >= -32) {
      put8(c, (uint8_t)(v & 0xff));  // negative fixint
    } else if (v >= -128) {
      put8(c, 0xd0);
      put8(c, (uint8_t)(v & 0xff));
    } else if (v >= -32768) {
      put8(c, 0xd1);
      be16(c, (uint16_t)(v & 0xffff));
    } else if (v >= -2147483648LL) {
      put8(c, 0xd2);
      be32(c, (uint32_t)(v & 0xffffffffLL));
    } else {
      put8(c, 0xd3);
      be64(c, (uint64_t)v);
    }
  }
}

void pack_str(Cur& c, const uint8_t* s, size_t n) {
  if (n < 32) {
    put8(c, 0xa0 | (uint8_t)n);
  } else if (n < 256) {
    put8(c, 0xd9);
    put8(c, (uint8_t)n);
  } else if (n < 65536) {
    put8(c, 0xda);
    be16(c, (uint16_t)n);
  } else {
    put8(c, 0xdb);
    be32(c, (uint32_t)n);
  }
  putn(c, s, n);
}

void pack_bin(Cur& c, const uint8_t* s, size_t n) {
  if (n < 256) {
    put8(c, 0xc4);
    put8(c, (uint8_t)n);
  } else if (n < 65536) {
    put8(c, 0xc5);
    be16(c, (uint16_t)n);
  } else {
    put8(c, 0xc6);
    be32(c, (uint32_t)n);
  }
  putn(c, s, n);
}

void pack_arr_hdr(Cur& c, size_t n) {
  if (n < 16) {
    put8(c, 0x90 | (uint8_t)n);
  } else if (n < 65536) {
    put8(c, 0xdc);
    be16(c, (uint16_t)n);
  } else {
    put8(c, 0xdd);
    be32(c, (uint32_t)n);
  }
}

void pack_f64(Cur& c, double v) {
  uint64_t u;
  memcpy(&u, &v, 8);
  put8(c, 0xcb);
  be64(c, u);
}

const uint8_t* S(const char* s) { return (const uint8_t*)s; }

}  // namespace

extern "C" {

// Packs records [id0, id0+nrec) into out (nrec * pad_size bytes).
// dead[r] is set to 1 when the record's URL was dropped to fit the
// pad (the record stays alive in the graph; its payload is "dead").
// Returns the number of dead records, or -1-r if record r exceeds the
// pad even with an empty URL.
int64_t pack_records(
    const uint8_t* vec_bytes, int64_t vec_nbytes,
    const int32_t* verts, const int32_t* vcounts, int64_t vcap,
    int64_t id0,
    const int64_t* timestamps,
    const int64_t* dims,              // nrec x 2
    const double* scores,             // nrec x nscores, may be null
    int64_t nscores,
    const uint8_t* urls, const int64_t* url_offs,  // nrec+1 offsets
    const int32_t* shards, const int32_t* shard_counts, int64_t scap,
    int64_t nrec, int64_t pad_size,
    uint8_t* out, uint8_t* dead) {
  int64_t ndead = 0;
  std::vector<uint8_t> scratch;
  for (int64_t r = 0; r < nrec; ++r) {
    const int64_t vn = vcounts[r];
    const int64_t sn = shard_counts[r];
    const int64_t ulen_orig = url_offs[r + 1] - url_offs[r];
    // conservative body-size bound: every int at its 9-byte max plus
    // fixed key/header overhead — guarantees the scratch encode below
    // cannot overflow regardless of pad_size
    const size_t bound =
        128 + (size_t)vec_nbytes + 9 * (size_t)(vn + sn + nscores + 4) +
        (size_t)ulen_orig;
    if (scratch.size() < bound) scratch.resize(bound);
    uint8_t* base = out + r * pad_size;
    for (int attempt = 0; attempt < 2; ++attempt) {
      const bool drop_url = attempt == 1;
      Cur c{scratch.data()};
      put8(c, 0x88);  // fixmap, 8 keys in PackedIndexEntry order
      pack_str(c, S("id"), 2);
      pack_int(c, id0 + r);
      pack_str(c, S("vector"), 6);
      pack_bin(c, vec_bytes + r * vec_nbytes, (size_t)vec_nbytes);
      pack_str(c, S("vertices"), 8);
      pack_arr_hdr(c, (size_t)vn);
      const int32_t* vrow = verts + r * vcap;
      for (int64_t i = 0; i < vn; ++i) pack_int(c, vrow[i]);
      pack_str(c, S("timestamp"), 9);
      pack_int(c, timestamps[r]);
      pack_str(c, S("dimensions"), 10);
      pack_arr_hdr(c, 2);
      pack_int(c, dims[2 * r]);
      pack_int(c, dims[2 * r + 1]);
      pack_str(c, S("scores"), 6);
      pack_arr_hdr(c, (size_t)nscores);
      for (int64_t i = 0; i < nscores; ++i)
        pack_f64(c, scores[r * nscores + i]);
      pack_str(c, S("url"), 3);
      pack_str(c, urls + url_offs[r], drop_url ? 0 : (size_t)ulen_orig);
      pack_str(c, S("shards"), 6);
      pack_arr_hdr(c, (size_t)sn);
      const int32_t* srow = shards + r * scap;
      for (int64_t i = 0; i < sn; ++i) pack_int(c, srow[i]);

      const int64_t blen = c.p - scratch.data();
      if (blen + 4 > pad_size) {
        if (drop_url) return -1 - r;
        continue;  // retry with the URL dropped (dead record)
      }
      const uint32_t l = (uint32_t)blen;
      memcpy(base, &l, 4);  // little-endian host, struct "<I"
      memcpy(base + 4, scratch.data(), (size_t)blen);
      memset(base + 4 + blen, 0, (size_t)(pad_size - 4 - blen));
      if (drop_url && ulen_orig > 0) {
        dead[r] = 1;
        ++ndead;
      } else {
        dead[r] = 0;
      }
      break;
    }
  }
  return ndead;
}

}  // extern "C"
