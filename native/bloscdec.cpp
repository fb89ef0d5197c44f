// Blosc-1 chunk decoder (LZ4 codec) for reading zarr-v2 stores.
//
// The reference's datasets are zarr DirectoryStores written with zarr 2.4's
// default compressor Blosc(cname='lz4', shuffle=byte) (vhoi/roi_features.py:
// 206-207 writes them; vhoi/data_loading.py:27-31 reads them). This
// implements the read path natively: LZ4 block decompression, the blosc-1
// chunk container (16-byte header + per-block offsets + optional per-block
// typesize-way stream splitting), and the byte-shuffle and bit-shuffle
// inverses. The bit-shuffle block layout (full LSB-first bit transpose when
// the element count is a multiple of 8, verbatim copy otherwise) was pinned
// empirically against libblosc 1.21.3 and is fuzz-tested against it
// (tests/test_zarr.py::TestRealCBlosc).
//
// Whether a block was split into typesize streams is not recorded in the
// blosc-1 header (the policy changed across c-blosc versions), so decoding
// tries split-first and falls back to unsplit; every stream must decompress
// to exactly its expected size, which makes a wrong guess fail loudly rather
// than corrupt data.

#include <cstdint>
#include <cstring>
#include <vector>

namespace {

inline int32_t le32(const uint8_t *p) {
  return static_cast<int32_t>(static_cast<uint32_t>(p[0]) |
                              (static_cast<uint32_t>(p[1]) << 8) |
                              (static_cast<uint32_t>(p[2]) << 16) |
                              (static_cast<uint32_t>(p[3]) << 24));
}

// LZ4 block format: [token][lit-len ext][literals][offset16][match-len ext]...
long lz4_decompress_block(const uint8_t *src, long slen, uint8_t *dst,
                          long dcap) {
  const uint8_t *s = src, *send = src + slen;
  uint8_t *d = dst, *dend = dst + dcap;
  while (s < send) {
    const uint8_t token = *s++;
    long lit = token >> 4;
    if (lit == 15) {
      uint8_t b;
      do {
        if (s >= send) return -1;
        b = *s++;
        lit += b;
      } while (b == 255);
    }
    if (s + lit > send || d + lit > dend) return -1;
    std::memcpy(d, s, lit);
    s += lit;
    d += lit;
    if (s >= send) break;  // final sequence carries literals only
    if (s + 2 > send) return -1;
    const long offset = s[0] | (s[1] << 8);
    s += 2;
    if (offset == 0 || d - dst < offset) return -1;
    long mlen = token & 15;
    if (mlen == 15) {
      uint8_t b;
      do {
        if (s >= send) return -1;
        b = *s++;
        mlen += b;
      } while (b == 255);
    }
    mlen += 4;
    if (d + mlen > dend) return -1;
    const uint8_t *m = d - offset;
    for (long i = 0; i < mlen; ++i) d[i] = m[i];  // overlap-safe forward copy
    d += mlen;
  }
  return d - dst;
}

// Decode one blosc block as `nsplits` length-prefixed streams laid out
// back-to-back in `out` (each stream decompresses to bsize / nsplits bytes).
bool decode_block_streams(const uint8_t *chunk, long chunk_len, long offset,
                          long bsize, long nsplits, uint8_t *out) {
  if (nsplits <= 0 || bsize % nsplits != 0) return false;
  const long neblock = bsize / nsplits;
  long pos = offset;
  for (long split = 0; split < nsplits; ++split) {
    if (pos + 4 > chunk_len) return false;
    const long cb = le32(chunk + pos);
    pos += 4;
    uint8_t *dst = out + split * neblock;
    if (cb < 0 || pos + cb > chunk_len) return false;
    if (cb == 0) {  // all-zero stream
      std::memset(dst, 0, neblock);
    } else if (cb == neblock) {  // stored uncompressed
      std::memcpy(dst, chunk + pos, neblock);
    } else {
      if (lz4_decompress_block(chunk + pos, cb, dst, neblock) != neblock)
        return false;
    }
    pos += cb;
  }
  return true;
}

// Inverse byte shuffle: planes of bsize/typesize bytes back to interleaved.
void unshuffle(long typesize, long bsize, const uint8_t *src, uint8_t *dst) {
  const long nelems = bsize / typesize;
  for (long t = 0; t < typesize; ++t) {
    const uint8_t *plane = src + t * nelems;
    for (long i = 0; i < nelems; ++i) dst[i * typesize + t] = plane[i];
  }
}

// 8x8 bit-matrix transpose: bit j of byte i  ->  bit i of byte j.
inline uint64_t transpose8(uint64_t x) {
  uint64_t t;
  t = (x ^ (x >> 7)) & 0x00AA00AA00AA00AAULL;
  x ^= t ^ (t << 7);
  t = (x ^ (x >> 14)) & 0x0000CCCC0000CCCCULL;
  x ^= t ^ (t << 14);
  t = (x ^ (x >> 28)) & 0x00000000F0F0F0F0ULL;
  x ^= t ^ (t << 28);
  return x;
}

// Inverse bitshuffle, matching c-blosc 1.x semantics (verified empirically
// against libblosc 1.21.3 output): with elems = bsize / typesize,
//   * elems % 8 != 0  ->  the block was NOT shuffled (verbatim copy);
//   * otherwise the first elems*typesize bytes are a full bit transpose
//     (LSB-first packing: shuffled row r = t*8+b holds bit b of byte-plane t
//     of every element, packed 8 elements per byte), and any tail bytes
//     (bsize % typesize) are copied verbatim.
void bit_unshuffle(long typesize, long bsize, const uint8_t *src,
                   uint8_t *dst) {
  const long nelems = bsize / typesize;
  if (nelems % 8 != 0) {
    std::memcpy(dst, src, bsize);
    return;
  }
  const long row_bytes = nelems / 8;  // bytes per shuffled bit row
  for (long t = 0; t < typesize; ++t) {
    const uint8_t *rows = src + t * 8 * row_bytes;
    for (long g = 0; g < row_bytes; ++g) {
      uint64_t x = 0;
      for (long b = 0; b < 8; ++b)
        x |= static_cast<uint64_t>(rows[b * row_bytes + g]) << (8 * b);
      const uint64_t y = transpose8(x);
      // byte i of y = byte-plane t of element 8g+i
      for (long i = 0; i < 8; ++i)
        dst[(8 * g + i) * typesize + t] =
            static_cast<uint8_t>((y >> (8 * i)) & 0xFF);
    }
  }
  std::memcpy(dst + nelems * typesize, src + nelems * typesize,
              bsize - nelems * typesize);
}

}  // namespace

extern "C" {

// Returns decompressed byte count, or a negative error code:
// -1 malformed, -3 non-LZ4 codec unsupported.
long blosc_lz4_decompress(const uint8_t *src, long slen, uint8_t *dst,
                          long dcap) {
  if (slen < 16) return -1;
  const uint8_t flags = src[2];
  const long typesize = src[3];
  const long nbytes = le32(src + 4);
  const long blocksize = le32(src + 8);
  const long cbytes = le32(src + 12);
  if (nbytes < 0 || nbytes > dcap || cbytes < 16 || cbytes > slen) return -1;
  if (nbytes == 0) return 0;
  if (flags & 0x2) {           // pure memcpy chunk
    if (16 + nbytes > slen) return -1;
    std::memcpy(dst, src + 16, nbytes);
    return nbytes;
  }
  if (((flags >> 5) & 0x7) != 1) return -3;  // codec: 1 = LZ4/LZ4HC
  if (blocksize <= 0) return -1;

  const bool byte_shuffled = flags & 0x1;
  const bool bit_shuffled = flags & 0x4;
  const bool shuffled = byte_shuffled || bit_shuffled;
  const long nblocks = (nbytes + blocksize - 1) / blocksize;
  if (16 + 4 * nblocks > slen) return -1;
  std::vector<uint8_t> scratch(shuffled ? blocksize : 0);

  for (long j = 0; j < nblocks; ++j) {
    const long offset = le32(src + 16 + 4 * j);
    if (offset < 16 || offset >= slen) return -1;
    const long bsize = (j == nblocks - 1) ? nbytes - j * blocksize : blocksize;
    uint8_t *out = shuffled ? scratch.data() : dst + j * blocksize;
    // Split policy is implicit in blosc-1; try typesize-way split first
    // (c-blosc's default for LZ4), then unsplit.
    bool ok = false;
    if (typesize > 1 && bsize % typesize == 0)
      ok = decode_block_streams(src, slen, offset, bsize, typesize, out);
    if (!ok) ok = decode_block_streams(src, slen, offset, bsize, 1, out);
    if (!ok) return -1;
    if (bit_shuffled) {
      bit_unshuffle(typesize, bsize, scratch.data(), dst + j * blocksize);
    } else if (byte_shuffled) {
      if (bsize % typesize != 0) return -1;
      unshuffle(typesize, bsize, scratch.data(), dst + j * blocksize);
    }
  }
  return nbytes;
}

}  // extern "C"
