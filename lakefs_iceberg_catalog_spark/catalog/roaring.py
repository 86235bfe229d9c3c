"""Z85 and Roaring-bitmap codecs for Delta Lake DELETION VECTORS.

Everything here is a from-scratch implementation of PUBLIC formats:

- Z85 binary-to-text encoding: the ZeroMQ 32/Z85 spec
  (rfc.zeromq.org/spec/32) — Delta encodes DV file UUIDs and inline DV
  payloads with it (PROTOCOL.md "Deletion Vector Descriptor Schema").
- 32-bit Roaring bitmap "portable" serialization: the public
  RoaringFormatSpec (github.com/RoaringBitmap/RoaringFormatSpec) —
  cookie header (12346 without / 12347 with run containers),
  descriptive header, optional offset header, then array / bitmap /
  run containers.
- RoaringBitmapArray: Delta's 64-bit wrapper (PROTOCOL.md "Deletion
  Vector Format"): magic 1681511377 (int32 LE), number of 32-bit
  bitmaps (int64 LE), then each 32-bit bitmap in the portable format,
  where bitmap i holds values [i*2^32, (i+1)*2^32).
- The DV file framing: a 1-byte format version (1), then per stored
  vector <size int32 BE> <data> <CRC-32 of data, int32 BE>; a
  descriptor's `offset` points at the size word.

Read path supports all three container types; the write path emits
array containers below the 4096-value threshold and bitmap containers
above it (run encoding is an optional writer optimization in the spec
— readers must accept it, writers may skip it).

The reference catalog itself never touches DVs (it delegates all data
IO to stock Spark+Iceberg), but Delta tables carrying DVs are a thing
a real ingest path meets; scan_delta_table applies these bitmaps as
row-index anti-joins (delta_format.py).
"""

from __future__ import annotations

import struct
import zlib

_Z85_ALPHABET = (
    "0123456789abcdefghijklmnopqrstuvwxyz"
    "ABCDEFGHIJKLMNOPQRSTUVWXYZ.-:+=^!/*?&<>()[]{}@%$#"
)
_Z85_DECODE = {c: i for i, c in enumerate(_Z85_ALPHABET)}

# --- Z85 (ZeroMQ spec 32) ------------------------------------------------


def z85_encode(data: bytes) -> str:
    """4 bytes -> 5 base-85 chars, big-endian, most significant digit
    first. The spec requires len(data) % 4 == 0 (DV payloads and UUIDs
    always are)."""
    if len(data) % 4:
        raise ValueError(f"Z85 input length {len(data)} not a multiple of 4")
    out = []
    for i in range(0, len(data), 4):
        (word,) = struct.unpack(">I", data[i : i + 4])
        chunk = []
        for _ in range(5):
            chunk.append(_Z85_ALPHABET[word % 85])
            word //= 85
        out.extend(reversed(chunk))
    return "".join(out)


def z85_decode(text: str) -> bytes:
    if len(text) % 5:
        raise ValueError(f"Z85 input length {len(text)} not a multiple of 5")
    out = bytearray()
    for i in range(0, len(text), 5):
        word = 0
        for c in text[i : i + 5]:
            try:
                word = word * 85 + _Z85_DECODE[c]
            except KeyError:
                raise ValueError(f"invalid Z85 character {c!r}") from None
        if word > 0xFFFFFFFF:
            raise ValueError(f"Z85 quintet {text[i:i + 5]!r} overflows 32 bits")
        out += struct.pack(">I", word)
    return bytes(out)


# --- 32-bit Roaring bitmap, portable serialization ------------------------

_SERIAL_COOKIE_NO_RUN = 12346
_SERIAL_COOKIE = 12347
_NO_OFFSET_THRESHOLD = 4  # run-cookie bitmaps this small omit the offset header
_ARRAY_MAX = 4096  # spec: containers above this cardinality use the bitset form


def serialize_roaring32(values: list[int]) -> bytes:
    """Serialize sorted distinct uint32 values in the portable format.
    Always writes the no-run-container layout (cookie 12346): cookie,
    container count, descriptive header, offset header, then array or
    bitmap containers."""
    containers: dict[int, list[int]] = {}
    last = -1
    for v in values:
        if v <= last:
            raise ValueError("values must be sorted strictly ascending")
        if v > 0xFFFFFFFF:
            raise ValueError(f"value {v} out of uint32 range")
        last = v
        containers.setdefault(v >> 16, []).append(v & 0xFFFF)
    keys = sorted(containers)
    n = len(keys)
    head = struct.pack("<II", _SERIAL_COOKIE_NO_RUN, n)
    desc = b"".join(
        struct.pack("<HH", k, len(containers[k]) - 1) for k in keys
    )
    # container payloads + their byte offsets from the start of the blob
    payloads = []
    for k in keys:
        lows = containers[k]
        if len(lows) <= _ARRAY_MAX:
            payloads.append(struct.pack(f"<{len(lows)}H", *lows))
        else:
            words = [0] * 1024
            for low in lows:
                words[low >> 6] |= 1 << (low & 63)
            payloads.append(struct.pack("<1024Q", *words))
    base = len(head) + len(desc) + 4 * n
    offsets = []
    pos = base
    for p in payloads:
        offsets.append(pos)
        pos += len(p)
    offs = struct.pack(f"<{n}I", *offsets) if n else b""
    return head + desc + offs + b"".join(payloads)


def deserialize_roaring32(data: bytes, start: int = 0) -> tuple[list[int], int]:
    """Parse one portable 32-bit bitmap at ``start``; returns (sorted
    values, end offset). Accepts all three container types and both
    cookie layouts."""
    (cookie16,) = struct.unpack_from("<H", data, start)
    if cookie16 == _SERIAL_COOKIE:
        (n_minus1,) = struct.unpack_from("<H", data, start + 2)
        n = n_minus1 + 1
        pos = start + 4
        flag_bytes = (n + 7) // 8
        run_flags = data[pos : pos + flag_bytes]
        pos += flag_bytes
        is_run = [(run_flags[i // 8] >> (i % 8)) & 1 == 1 for i in range(n)]
        has_offsets = n >= _NO_OFFSET_THRESHOLD
    else:
        (cookie32, n) = struct.unpack_from("<II", data, start)
        if cookie32 != _SERIAL_COOKIE_NO_RUN:
            raise ValueError(f"bad roaring cookie {cookie32} at offset {start}")
        pos = start + 8
        is_run = [False] * n
        has_offsets = True
    desc = []
    for _ in range(n):
        key, card_minus1 = struct.unpack_from("<HH", data, pos)
        desc.append((key, card_minus1 + 1))
        pos += 4
    if has_offsets:
        pos += 4 * n  # reads are sequential; the offset header is for seeking
    out: list[int] = []
    for i, (key, card) in enumerate(desc):
        hi = key << 16
        if is_run[i]:
            (n_runs,) = struct.unpack_from("<H", data, pos)
            pos += 2
            for _ in range(n_runs):
                first, length = struct.unpack_from("<HH", data, pos)
                pos += 4
                out.extend(hi | v for v in range(first, first + length + 1))
        elif card <= _ARRAY_MAX:
            lows = struct.unpack_from(f"<{card}H", data, pos)
            pos += 2 * card
            out.extend(hi | v for v in lows)
        else:
            words = struct.unpack_from("<1024Q", data, pos)
            pos += 8192
            for wi, w in enumerate(words):
                base = hi | (wi << 6)
                while w:
                    b = w & -w
                    out.append(base | b.bit_length() - 1)
                    w ^= b
    return out, pos


# --- RoaringBitmapArray (Delta's 64-bit portable wrapper) ------------------

_ARRAY_MAGIC = 1681511377


def serialize_bitmap_array(positions: list[int]) -> bytes:
    """Serialize sorted distinct uint64 row indexes as Delta's portable
    RoaringBitmapArray: magic, bitmap count, then one 32-bit portable
    bitmap per populated 2^32 bucket (empty intermediate buckets still
    serialize, as the format is positional)."""
    pos_sorted = sorted(set(positions))
    if pos_sorted and pos_sorted[0] < 0:
        raise ValueError("row indexes must be non-negative")
    buckets: dict[int, list[int]] = {}
    for p in pos_sorted:
        buckets.setdefault(p >> 32, []).append(p & 0xFFFFFFFF)
    n_maps = (max(buckets) + 1) if buckets else 0
    out = [struct.pack("<Iq", _ARRAY_MAGIC, n_maps)]
    for i in range(n_maps):
        out.append(serialize_roaring32(buckets.get(i, [])))
    return b"".join(out)


def deserialize_bitmap_array(data: bytes) -> list[int]:
    magic, n_maps = struct.unpack_from("<Iq", data, 0)
    if magic != _ARRAY_MAGIC:
        raise ValueError(f"bad RoaringBitmapArray magic {magic}")
    pos = 12
    out: list[int] = []
    for i in range(n_maps):
        vals, pos = deserialize_roaring32(data, pos)
        out.extend((i << 32) | v for v in vals)
    return out


# --- DV file framing -------------------------------------------------------

DV_FORMAT_VERSION = 1


def frame_dv_file(payloads: list[bytes]) -> tuple[bytes, list[int]]:
    """Assemble a DV file: version byte, then per vector
    <size BE><data><crc32 BE>. Returns (file bytes, per-vector offsets)
    — each offset points at the size word, the descriptor's `offset`."""
    chunks = [bytes([DV_FORMAT_VERSION])]
    offsets = []
    pos = 1
    for data in payloads:
        offsets.append(pos)
        chunk = (
            struct.pack(">i", len(data))
            + data
            + struct.pack(">I", zlib.crc32(data) & 0xFFFFFFFF)
        )
        chunks.append(chunk)
        pos += len(chunk)
    return b"".join(chunks), offsets


def read_dv_payload(file_bytes: bytes, offset: int, size_in_bytes: int) -> bytes:
    """Extract and checksum-verify one stored vector."""
    if file_bytes[0] != DV_FORMAT_VERSION:
        raise ValueError(f"unsupported DV file format version {file_bytes[0]}")
    (size,) = struct.unpack_from(">i", file_bytes, offset)
    if size != size_in_bytes:
        raise ValueError(
            f"DV size mismatch: descriptor says {size_in_bytes}, file says {size}"
        )
    data = file_bytes[offset + 4 : offset + 4 + size]
    (crc,) = struct.unpack_from(">I", file_bytes, offset + 4 + size)
    if zlib.crc32(data) & 0xFFFFFFFF != crc:
        raise ValueError("DV payload failed CRC-32 verification")
    return data
