"""Minimal LMDB file writer — test fixture for the dependency-free reader.

Writes structurally valid LMDB data files (meta pages, leaf/branch pages,
overflow chains) for unit-testing ``dmme_tpu.data.lmdb_reader`` without the
lmdb C library.
"""

from __future__ import annotations

import struct
from typing import Dict, List, Tuple

PSIZE = 4096
P_BRANCH, P_LEAF, P_OVERFLOW, P_META = 0x01, 0x02, 0x04, 0x08
F_BIGDATA = 0x01
INVALID = 0xFFFFFFFFFFFFFFFF
PAGEHDR = 16


def _page_header(pgno: int, flags: int, lower: int = 0, upper: int = 0,
                 ov_pages: int = 0) -> bytes:
    if flags & P_OVERFLOW:
        return struct.pack("<QHHI", pgno, 0, flags, ov_pages)
    return struct.pack("<QHHHH", pgno, 0, flags, lower, upper)


def _leaf_page(pgno: int, items: List[Tuple[bytes, bytes, int]]) -> bytes:
    """items: (key, data, flags); data is raw bytes or 8-byte ov pgno."""
    nodes = []
    for key, data, flags in items:
        size = len(data) if not (flags & F_BIGDATA) else len(data)
        # for BIGDATA the recorded size is the real value size — caller
        # passes it via the companion list; handled below
        nodes.append((key, data, flags))
    page = bytearray(PSIZE)
    upper = PSIZE
    ptrs = []
    for key, data, flags in nodes:
        node = bytearray()
        if flags & F_BIGDATA:
            dsize, payload = data  # (true size, packed ov pgno)
        else:
            dsize, payload = len(data), data
        node += struct.pack("<HHHH", dsize & 0xFFFF, (dsize >> 16) & 0xFFFF,
                            flags, len(key))
        node += key + payload
        if len(node) % 2:
            node += b"\x00"
        upper -= len(node)
        page[upper : upper + len(node)] = node
        ptrs.append(upper)
    lower = PAGEHDR + 2 * len(nodes)
    page[:PAGEHDR] = _page_header(pgno, P_LEAF, lower, upper)
    for i, p in enumerate(ptrs):
        struct.pack_into("<H", page, PAGEHDR + 2 * i, p)
    return bytes(page)


def _branch_page(pgno: int, children: List[Tuple[bytes, int]]) -> bytes:
    """children: (separator key — b'' for the first, child pgno)."""
    page = bytearray(PSIZE)
    upper = PSIZE
    ptrs = []
    for key, child in children:
        node = bytearray()
        node += struct.pack("<HHHH", child & 0xFFFF, (child >> 16) & 0xFFFF,
                            (child >> 32) & 0xFFFF, len(key))
        node += key
        if len(node) % 2:
            node += b"\x00"
        upper -= len(node)
        page[upper : upper + len(node)] = node
        ptrs.append(upper)
    lower = PAGEHDR + 2 * len(children)
    page[:PAGEHDR] = _page_header(pgno, P_BRANCH, lower, upper)
    for i, p in enumerate(ptrs):
        struct.pack_into("<H", page, PAGEHDR + 2 * i, p)
    return bytes(page)


def _overflow_pages(pgno: int, data: bytes) -> bytes:
    total = PAGEHDR + len(data)
    npages = (total + PSIZE - 1) // PSIZE
    buf = bytearray(npages * PSIZE)
    buf[:PAGEHDR] = _page_header(pgno, P_OVERFLOW, ov_pages=npages)
    buf[PAGEHDR : PAGEHDR + len(data)] = data
    return bytes(buf)


def _meta_page(pgno: int, txnid: int, main_root: int, entries: int,
               depth: int, last_pg: int) -> bytes:
    page = bytearray(PSIZE)
    page[:PAGEHDR] = _page_header(pgno, P_META)
    off = PAGEHDR
    struct.pack_into("<II", page, off, 0xBEEFC0DE, 1)
    off += 8
    struct.pack_into("<QQ", page, off, 0, 10 * PSIZE)  # mm_address, mm_mapsize
    off += 16
    # FREE_DBI: md_pad carries the page size
    struct.pack_into("<IHHQQQQQ", page, off, PSIZE, 0, 0, 0, 0, 0, 0, INVALID)
    off += 48
    struct.pack_into("<IHHQQQQQ", page, off, 0, 0, depth, 0, 0, 0, entries,
                     main_root)
    off += 48
    struct.pack_into("<QQ", page, off, last_pg, txnid)
    return bytes(page)


def _node_size(key: bytes, payload_len: int) -> int:
    n = 8 + len(key) + payload_len
    return n + (n % 2)


def write_lmdb(path: str, kv: Dict[bytes, bytes], leaf_split: int = 0) -> None:
    """Write a valid single-tree LMDB data file.

    Leaves are packed by CAPACITY (auto-split into a 2-level tree when one
    page is not enough); ``leaf_split > 0`` forces that many keys per leaf
    instead. Values larger than ~1KB go to overflow pages.
    """
    import os

    os.makedirs(os.path.dirname(os.path.abspath(path)) or ".", exist_ok=True)
    items = sorted(kv.items())
    pages: Dict[int, bytes] = {}
    next_pg = 2  # 0,1 are meta

    def alloc(n=1):
        nonlocal next_pg
        p = next_pg
        next_pg += n
        return p

    def build_leaf_items(chunk):
        nonlocal pages
        leaf_items = []
        for k, v in chunk:
            if len(v) > 1024:
                ov = alloc((PAGEHDR + len(v) + PSIZE - 1) // PSIZE)
                pages[ov] = _overflow_pages(ov, v)
                leaf_items.append((k, (len(v), struct.pack("<Q", ov)), F_BIGDATA))
            else:
                leaf_items.append((k, v, 0))
        return leaf_items

    # split items into leaf-page chunks
    if leaf_split > 0:
        chunks = [items[i : i + leaf_split] for i in range(0, len(items), leaf_split)]
    else:
        chunks, cur, used = [], [], 0
        for k, v in items:
            payload = 8 if len(v) > 1024 else len(v)
            sz = _node_size(k, payload) + 2  # node + ptr slot
            if cur and PAGEHDR + used + sz > PSIZE:
                chunks.append(cur)
                cur, used = [], 0
            cur.append((k, v))
            used += sz
        if cur or not chunks:
            chunks.append(cur)

    if len(chunks) == 1:
        root = alloc()
        pages[root] = _leaf_page(root, build_leaf_items(chunks[0]))
        depth = 1
    else:
        leaves = []
        for chunk in chunks:
            pg = alloc()
            pages[pg] = _leaf_page(pg, build_leaf_items(chunk))
            leaves.append((chunk[0][0], pg))
        # one branch level must fit every child pointer
        cap = sum(_node_size(k, 0) + 2 for k, _ in leaves)
        assert PAGEHDR + cap <= PSIZE, (
            f"fixture supports 2-level trees only ({len(leaves)} leaves too "
            "many for one branch page — use shorter keys/fewer items)"
        )
        root = alloc()
        children = [(b"", leaves[0][1])] + [(k, pg) for k, pg in leaves[1:]]
        pages[root] = _branch_page(root, children)
        depth = 2

    last_pg = next_pg - 1
    pages[0] = _meta_page(0, 1, INVALID, 0, 0, last_pg)      # stale meta
    pages[1] = _meta_page(1, 2, root, len(items), depth, last_pg)  # live meta

    with open(path, "wb") as f:
        f.truncate(next_pg * PSIZE)
        for pg, blob in sorted(pages.items()):
            f.seek(pg * PSIZE)
            f.write(blob)  # overflow blobs span multiple pages
