// vss_store — native checkpoint container for duckdb_vss_tpu indexes.
//
// TPU-native analog of the reference's persistence path
// (/root/reference/src/hnsw/hnsw_index.cpp:15-114 LinkedBlock streaming +
// usearch save_to_stream/load_from_stream, index_dense.hpp:810-973):
// a sectioned binary container with fixed-size checksummed blocks and an
// mmap-backed deferred-load read path (pages fault in on first access,
// mirroring the reference's deferred index load on first table access).
//
// Layout:
//   [vss_file_header]
//   per section: [vss_section_header][payload blocks...]
//   payload is split into BLOCK_SIZE chunks, each preceded by
//   {u32 payload_len, u32 crc32} — the LinkedBlock analog: corruption is
//   detected per block, not per file.
//
// C ABI for ctypes. Thread-safe for concurrent readers of distinct
// handles; a handle is not internally synchronized.

#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <fcntl.h>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

static const uint64_t VSS_MAGIC = 0x30315550'54535356ULL;  // "VSSTPU01"
static const uint32_t VSS_VERSION = 1;
static const uint32_t BLOCK_SIZE = 1u << 18;  // 256 KiB payload per block

typedef struct {
  uint64_t magic;
  uint32_t version;
  uint32_t n_sections;
  // index metadata (usearch 64-byte header analog, index_dense.hpp:27-83)
  uint32_t metric;          // 0=l2sq 1=cosine 2=ip
  uint32_t dims;
  uint32_t d_pad;
  uint32_t m;
  uint32_t m0;
  uint32_t ef_construction;
  uint32_t ef_search;
  int32_t max_level;
  int64_t entry_node;
  uint64_t count;
  uint64_t capacity;
  uint64_t cap_upper;
  uint64_t upper_count;
  uint64_t reserved[4];
} vss_file_header;

typedef struct {
  char name[16];
  uint32_t dtype;      // caller-defined tag
  uint32_t n_blocks;
  uint64_t nbytes;     // total payload bytes
  uint64_t next_off;   // file offset of the section AFTER this one
} vss_section_header;

// ---------------------------------------------------------------------------
// crc32 (standard polynomial, table-driven)
// ---------------------------------------------------------------------------

static uint32_t crc_table[256];
static bool crc_init_done = false;

static void crc_init() {
  if (crc_init_done) return;
  for (uint32_t i = 0; i < 256; i++) {
    uint32_t c = i;
    for (int k = 0; k < 8; k++)
      c = (c & 1) ? 0xEDB88320u ^ (c >> 1) : c >> 1;
    crc_table[i] = c;
  }
  crc_init_done = true;
}

static uint32_t crc32_buf(const uint8_t* p, size_t n) {
  crc_init();
  uint32_t c = 0xFFFFFFFFu;
  for (size_t i = 0; i < n; i++) c = crc_table[(c ^ p[i]) & 0xFF] ^ (c >> 8);
  return c ^ 0xFFFFFFFFu;
}

// ---------------------------------------------------------------------------
// writer
// ---------------------------------------------------------------------------

typedef struct {
  FILE* f;
  vss_file_header hdr;
  uint32_t sections_written;
  long hdr_pos;
} vss_writer;

vss_writer* vss_writer_open(const char* path, const vss_file_header* hdr) {
  FILE* f = fopen(path, "wb");
  if (!f) return nullptr;
  vss_writer* w = (vss_writer*)calloc(1, sizeof(vss_writer));
  w->f = f;
  w->hdr = *hdr;
  w->hdr.magic = VSS_MAGIC;
  w->hdr.version = VSS_VERSION;
  w->hdr_pos = 0;
  // placeholder header; rewritten on close with final section count
  fwrite(&w->hdr, sizeof(w->hdr), 1, f);
  return w;
}

int vss_writer_section(vss_writer* w, const char* name, uint32_t dtype,
                       const void* data, uint64_t nbytes) {
  if (!w || !w->f) return -1;
  vss_section_header sh;
  memset(&sh, 0, sizeof(sh));
  snprintf(sh.name, sizeof(sh.name), "%s", name);
  sh.dtype = dtype;
  sh.nbytes = nbytes;
  sh.n_blocks = (uint32_t)((nbytes + BLOCK_SIZE - 1) / BLOCK_SIZE);
  if (nbytes == 0) sh.n_blocks = 0;
  long sh_pos = ftell(w->f);
  if (fwrite(&sh, sizeof(sh), 1, w->f) != 1) return -2;
  const uint8_t* p = (const uint8_t*)data;
  uint64_t left = nbytes;
  while (left > 0) {
    uint32_t len = left > BLOCK_SIZE ? BLOCK_SIZE : (uint32_t)left;
    uint32_t crc = crc32_buf(p, len);
    if (fwrite(&len, 4, 1, w->f) != 1) return -3;
    if (fwrite(&crc, 4, 1, w->f) != 1) return -3;
    if (fwrite(p, 1, len, w->f) != len) return -3;
    p += len;
    left -= len;
  }
  long end_pos = ftell(w->f);
  sh.next_off = (uint64_t)end_pos;
  fseek(w->f, sh_pos, SEEK_SET);
  fwrite(&sh, sizeof(sh), 1, w->f);
  fseek(w->f, end_pos, SEEK_SET);
  w->sections_written++;
  return 0;
}

int vss_writer_close(vss_writer* w) {
  if (!w) return -1;
  w->hdr.n_sections = w->sections_written;
  fseek(w->f, w->hdr_pos, SEEK_SET);
  fwrite(&w->hdr, sizeof(w->hdr), 1, w->f);
  int rc = fclose(w->f);
  free(w);
  return rc;
}

// ---------------------------------------------------------------------------
// reader (mmap; deferred load — pages fault in on demand)
// ---------------------------------------------------------------------------

typedef struct {
  int fd;            // -1 when reading caller-owned memory
  uint8_t* map;
  size_t map_len;
  int owns_map;      // 1: munmap on close; 0: caller owns the buffer
  vss_file_header hdr;
} vss_reader;

// Reader over a caller-owned in-memory image of the container (e.g. a
// blob fetched from block storage) — no temp-file round trip. The buffer
// must outlive the reader handle.
vss_reader* vss_reader_open_mem(const void* buf, uint64_t len) {
  if (!buf || len < sizeof(vss_file_header)) return nullptr;
  vss_reader* r = (vss_reader*)calloc(1, sizeof(vss_reader));
  r->fd = -1;
  r->map = (uint8_t*)buf;
  r->map_len = (size_t)len;
  r->owns_map = 0;
  memcpy(&r->hdr, buf, sizeof(r->hdr));
  if (r->hdr.magic != VSS_MAGIC || r->hdr.version != VSS_VERSION) {
    free(r);
    return nullptr;
  }
  return r;
}

vss_reader* vss_reader_open(const char* path) {
  int fd = open(path, O_RDONLY);
  if (fd < 0) return nullptr;
  struct stat st;
  if (fstat(fd, &st) != 0 || (size_t)st.st_size < sizeof(vss_file_header)) {
    close(fd);
    return nullptr;
  }
  uint8_t* map =
      (uint8_t*)mmap(nullptr, st.st_size, PROT_READ, MAP_PRIVATE, fd, 0);
  if (map == MAP_FAILED) {
    close(fd);
    return nullptr;
  }
  vss_reader* r = (vss_reader*)calloc(1, sizeof(vss_reader));
  r->fd = fd;
  r->map = map;
  r->map_len = st.st_size;
  r->owns_map = 1;
  memcpy(&r->hdr, map, sizeof(r->hdr));
  if (r->hdr.magic != VSS_MAGIC || r->hdr.version != VSS_VERSION) {
    munmap(map, st.st_size);
    close(fd);
    free(r);
    return nullptr;
  }
  return r;
}

const vss_file_header* vss_reader_header(vss_reader* r) {
  return r ? &r->hdr : nullptr;
}

// Copy a section's payload into out (caller allocates nbytes). Verifies
// per-block CRCs. Returns payload size, or -1 (not found) / -2 (corrupt).
int64_t vss_reader_section(vss_reader* r, const char* name, void* out,
                           uint64_t out_cap) {
  if (!r) return -1;
  uint64_t off = sizeof(vss_file_header);
  for (uint32_t s = 0; s < r->hdr.n_sections; s++) {
    if (off + sizeof(vss_section_header) > r->map_len) return -2;
    vss_section_header sh;
    memcpy(&sh, r->map + off, sizeof(sh));
    uint64_t payload_off = off + sizeof(sh);
    if (strncmp(sh.name, name, sizeof(sh.name)) == 0) {
      if (out == nullptr) return (int64_t)sh.nbytes;  // size query
      if (sh.nbytes > out_cap) return -3;
      uint8_t* dst = (uint8_t*)out;
      uint64_t p = payload_off;
      for (uint32_t b = 0; b < sh.n_blocks; b++) {
        if (p + 8 > r->map_len) return -2;
        uint32_t len, crc;
        memcpy(&len, r->map + p, 4);
        memcpy(&crc, r->map + p + 4, 4);
        p += 8;
        if (p + len > r->map_len) return -2;
        if (crc32_buf(r->map + p, len) != crc) return -2;
        memcpy(dst, r->map + p, len);
        dst += len;
        p += len;
      }
      return (int64_t)sh.nbytes;
    }
    off = sh.next_off;
    if (off == 0 || off > r->map_len) return -2;
  }
  return -1;
}

void vss_reader_close(vss_reader* r) {
  if (!r) return;
  if (r->owns_map) munmap(r->map, r->map_len);
  if (r->fd >= 0) close(r->fd);
  free(r);
}

uint32_t vss_block_size() { return BLOCK_SIZE; }

// ---------------------------------------------------------------------------
// block file — the database's FixedSizeAllocator analog
// (/root/reference/src/hnsw/hnsw_index.cpp:15-114 LinkedBlock storage into
// DuckDB's FixedSizeAllocator; hnsw_reclaim_storage.test_slow proves block
// REUSE across DROP INDEX / CREATE INDEX / CHECKPOINT cycles).
//
// A single mutable file of fixed-size blocks, written in place:
//   [vss_bf_header][block 0][block 1]...
//   block := {u32 payload_len, u32 crc32}{payload ... zero pad}
// Allocation policy (free lists, blob -> block ids) lives in the caller
// (Python BlockManager) which owns the catalog; this layer does IO + CRC.
// ---------------------------------------------------------------------------

static const uint64_t VSS_BF_MAGIC = 0x31304B4C'42535356ULL;  // "VSSBLK01"

typedef struct {
  uint64_t magic;
  uint32_t version;
  uint32_t block_size;
  uint64_t reserved[6];
} vss_bf_header;

typedef struct {
  FILE* f;
  uint32_t block_size;
} vss_blockfile;

static const uint32_t VSS_BF_HDR = sizeof(vss_bf_header);

vss_blockfile* vss_bf_open(const char* path, uint32_t block_size) {
  FILE* f = fopen(path, "r+b");
  vss_bf_header hdr;
  if (f) {
    if (fread(&hdr, sizeof(hdr), 1, f) != 1 || hdr.magic != VSS_BF_MAGIC) {
      fclose(f);
      return nullptr;
    }
  } else {
    f = fopen(path, "w+b");
    if (!f) return nullptr;
    memset(&hdr, 0, sizeof(hdr));
    hdr.magic = VSS_BF_MAGIC;
    hdr.version = 1;
    hdr.block_size = block_size ? block_size : BLOCK_SIZE;
    if (fwrite(&hdr, sizeof(hdr), 1, f) != 1) {
      fclose(f);
      return nullptr;
    }
    fflush(f);
  }
  vss_blockfile* bf = (vss_blockfile*)calloc(1, sizeof(vss_blockfile));
  bf->f = f;
  bf->block_size = hdr.block_size;
  return bf;
}

uint32_t vss_bf_block_size(vss_blockfile* bf) {
  return bf ? bf->block_size : 0;
}

// payload capacity per block (block size minus the {len, crc} header)
uint32_t vss_bf_usable(vss_blockfile* bf) {
  return bf ? bf->block_size - 8 : 0;
}

int64_t vss_bf_total_blocks(vss_blockfile* bf) {
  if (!bf) return -1;
  fflush(bf->f);
  fseek(bf->f, 0, SEEK_END);
  long end = ftell(bf->f);
  if (end < (long)VSS_BF_HDR) return 0;
  return ((uint64_t)end - VSS_BF_HDR + bf->block_size - 1) / bf->block_size;
}

// Write one block's payload in place (grows the file when block_id is
// past the end). len must be <= usable capacity.
int vss_bf_write(vss_blockfile* bf, uint64_t block_id, const void* data,
                 uint32_t len) {
  if (!bf || len > bf->block_size - 8) return -1;
  uint64_t off = VSS_BF_HDR + block_id * (uint64_t)bf->block_size;
  if (fseek(bf->f, (long)off, SEEK_SET) != 0) return -2;
  uint32_t crc = crc32_buf((const uint8_t*)data, len);
  if (fwrite(&len, 4, 1, bf->f) != 1) return -3;
  if (fwrite(&crc, 4, 1, bf->f) != 1) return -3;
  if (len && fwrite(data, 1, len, bf->f) != len) return -3;
  // zero-pad so total_blocks (file size based) counts this block fully
  uint32_t pad = bf->block_size - 8 - len;
  if (pad) {
    static const char zeros[4096] = {0};
    while (pad) {
      uint32_t n = pad > sizeof(zeros) ? (uint32_t)sizeof(zeros) : pad;
      if (fwrite(zeros, 1, n, bf->f) != n) return -3;
      pad -= n;
    }
  }
  return 0;
}

// Read one block's payload; returns length, -2 on corruption.
int64_t vss_bf_read(vss_blockfile* bf, uint64_t block_id, void* out,
                    uint32_t cap) {
  if (!bf) return -1;
  uint64_t off = VSS_BF_HDR + block_id * (uint64_t)bf->block_size;
  if (fseek(bf->f, (long)off, SEEK_SET) != 0) return -2;
  uint32_t len, crc;
  if (fread(&len, 4, 1, bf->f) != 1) return -2;
  if (fread(&crc, 4, 1, bf->f) != 1) return -2;
  if (len > bf->block_size - 8 || len > cap) return -2;
  if (len && fread(out, 1, len, bf->f) != len) return -2;
  if (crc32_buf((const uint8_t*)out, len) != crc) return -2;
  return (int64_t)len;
}

int vss_bf_flush(vss_blockfile* bf) {
  if (!bf) return -1;
  fflush(bf->f);
  return fsync(fileno(bf->f));
}

int vss_bf_close(vss_blockfile* bf) {
  if (!bf) return -1;
  int rc = fclose(bf->f);
  free(bf);
  return rc;
}

}  // extern "C"
