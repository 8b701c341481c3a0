"""End-to-end device pipelines: compressed bytes in → decoded tensors out.

This is the production path (host side kept to container parsing + the
native block scan, per the boundary in SURVEY §3): gzip members and PNG
IDAT streams decode on device via ops.inflate_v3, PNG reconstruction
runs the wavefront unfilter kernel, color expansion is a device gather,
and integrity checks (CRC-32 / Adler-32) can run on device or host.
"""

from __future__ import annotations

import dataclasses
import struct

import numpy as np

from debigulator_tpu import constants as C
from debigulator_tpu.models import png_codec
from debigulator_tpu.models.gzip_codec import GzipError, _parse_header
from debigulator_tpu.models.zlib_codec import parse_zlib_header
from debigulator_tpu.ops import checksum as ck
from debigulator_tpu.ops.inflate_v3 import inflate_device_v3 as inflate_device
from debigulator_tpu.ops.unfilter_device import unfilter_device
from debigulator_tpu.utils.logging import PhaseLog


_EXPAND_RGB = None


def _expand_rgb_jit(recon, h, w):
    # Module-level jit cache: a per-call jax.jit wrapper would re-trace
    # and re-compile on EVERY image.
    global _EXPAND_RGB
    if _EXPAND_RGB is None:
        import functools

        import jax
        import jax.numpy as jnp

        @functools.partial(jax.jit, static_argnames=("h", "w"))
        def f(r, h, w):
            r3 = r.reshape(h, w, 3)
            return jnp.concatenate(
                [r3, jnp.full((h, w, 1), 255, r3.dtype)], axis=2
            )

        _EXPAND_RGB = f
    return _EXPAND_RGB(recon, h, w)


def decode_gzip_device(data, verify: bool = True) -> bytes:
    """gzip decode with all DEFLATE work on device (multi-member)."""
    data = memoryview(data)
    n = len(data)
    if n == 0:
        raise GzipError("empty input is not a gzip stream")
    from debigulator_tpu.ops.inflate_v3 import CELL_BITS
    from debigulator_tpu.ops.scanner import scan_stream_cells

    out_parts = []
    at = 0
    while at < n:
        plog = PhaseLog("gzip.decode_device")
        p, hdr = _parse_header(data, at)
        payload = bytes(data[p:])
        # ONE host scan per member: the same pass that finds the member's
        # end also records code lengths + exact cell entries for the
        # device plan (no rescan inside inflate_device).
        scanned = scan_stream_cells(payload, CELL_BITS)
        blocks = scanned[0]
        plog.mark("scan")
        end = p + (blocks[-1].end_bit + 7) // 8
        if end + 8 > n:
            raise GzipError("truncated gzip footer")
        out = inflate_device(payload[: end - p], scanned=scanned)
        plog.mark("inflate")
        crc, isize = struct.unpack_from("<II", data, end)
        if verify:
            if len(out) & 0xFFFFFFFF != isize:
                raise GzipError(f"ISIZE mismatch: {len(out)} vs {isize}")
            if ck.crc32(out) != crc:
                raise GzipError("CRC-32 mismatch")
            plog.mark("crc")
        out_parts.append(out)
        member_start = at
        at = end + 8
        plog.done(member_bytes=at - member_start, out_bytes=len(out),
                  blocks=len(blocks), crc="ok" if verify else "skipped")
    return b"".join(out_parts)


_PNG_FUSED = None


def _png_fused(pa, arrays, slots, n_seg, out_size, h, w, bpp, expand_rgb,
               interpret):
    """ONE device dispatch for the whole PNG pixel path: flagship v15
    inflate -> Adler-32 -> Pallas wavefront unfilter -> (optional)
    RGB->RGBA expand.  Returns (pixels uint8, adler u32, overflow)."""
    import jax.numpy as jnp

    from debigulator_tpu.ops import inflate_v3 as v3
    from debigulator_tpu.ops.checksum import adler32_jnp
    from debigulator_tpu.ops.unfilter_pallas import unfilter_wavefront_pallas

    body, overflow = v3.flagship_body(pa, arrays, slots, n_seg,
                                      interpret=interpret)
    raw = body[:out_size]
    adler = adler32_jnp(raw, out_size)
    recon = unfilter_wavefront_pallas(
        raw.astype(jnp.uint8), h, w, bpp, interpret=interpret)
    if expand_rgb:
        r3 = recon.reshape(h, w, 3)
        recon = jnp.concatenate(
            [r3, jnp.full((h, w, 1), 255, r3.dtype)], axis=2
        ).reshape(h, w * 4)
    return recon, adler, overflow


def _png_fused_jit():
    global _PNG_FUSED
    if _PNG_FUSED is None:
        import functools

        import jax

        _PNG_FUSED = functools.partial(
            jax.jit,
            static_argnames=("slots", "n_seg", "out_size", "h", "w",
                             "bpp", "expand_rgb", "interpret"),
        )(_png_fused)
    return _PNG_FUSED


_PNG_FUSED_PACKED = None


def _png_fused_packed(buf, metas, slots, n_seg, out_size, h, w, bpp,
                      expand_rgb, interpret):
    """_png_fused fed by the ONE-transfer packed staging buffer."""
    from debigulator_tpu.ops.inflate_v3 import unpack_pa_arrays

    pa, arrays = unpack_pa_arrays(buf, metas)
    return _png_fused(pa, arrays, slots, n_seg, out_size, h, w, bpp,
                      expand_rgb, interpret)


def _png_fused_packed_jit():
    global _PNG_FUSED_PACKED
    if _PNG_FUSED_PACKED is None:
        import functools

        import jax

        _PNG_FUSED_PACKED = functools.partial(
            jax.jit,
            static_argnames=("metas", "slots", "n_seg", "out_size", "h",
                             "w", "bpp", "expand_rgb", "interpret"),
        )(_png_fused_packed)
    return _PNG_FUSED_PACKED


def decode_png_device(data, verify_crc: bool = True, verify_adler: bool = True):
    """PNG decode, device-resident end to end: inflate + Adler + unfilter
    + RGBA expansion all run as ONE fused jit dispatch — the only host
    transfers are the compressed stream in and the final image out (the
    round-3 path paid 4 separate dispatches plus a filter-byte readback,
    ~60 ms of tunnel latency per image)."""
    import jax

    from debigulator_tpu.ops import inflate_v3 as v3
    from debigulator_tpu.ops.phase_a_pallas import build_pa_arrays
    from debigulator_tpu.ops.scanner import scan_stream_cells
    from debigulator_tpu.ops.unfilter_pallas import (
        MAX_SKEW_BYTES,
        skew_bytes,
    )

    plog = PhaseLog("png.decode_device")
    chunks = png_codec.parse_chunks(data, verify_crc=verify_crc)
    info = chunks.info
    parse_zlib_header(chunks.idat)
    plog.mark("chunks")

    payload = chunks.idat[2:]
    expected_size = info.height * (1 + info.stride)
    blocks, lengths, cells = scan_stream_cells(payload, v3.CELL_BITS)
    plan = v3.build_plan_v3(payload, blocks, lengths, cells=cells)
    pa = (build_pa_arrays(plan, stage=False)
          if plan.exact_entries else None)
    fits = skew_bytes(info.height, info.width, info.bpp) <= MAX_SKEW_BYTES
    on_tpu = jax.default_backend() not in ("cpu",)
    force = bool(__import__("os").environ.get("DBG_FORCE_FUSED_PNG"))
    # On CPU the interpret-mode fused kernels are slow; tests cover the
    # fused path explicitly (DBG_FORCE_FUSED_PNG) on small images.
    if (pa is None or not fits or plan.first_state == v3.TERMINAL
            or v3.v15_stream_too_large(plan) or not (on_tpu or force)):
        return _decode_png_device_unfused(chunks, info, plog,
                                          verify_adler=verify_adler)
    if plan.out_size != expected_size:
        raise png_codec.PngError(
            f"decompressed size {plan.out_size} != expected {expected_size}"
        )
    # ONE-transfer packed staging (each separate host->device array
    # costs ~21 ms of tunnel latency; a fresh image stages 7).
    buf, metas = v3.pack_stage_arrays(pa, plan)
    n_seg = v3._round_pow2(max(1, -(-plan.out_size // v3.SEG_BYTES)), 1)
    plog.mark("scan")
    ct = info.color_type
    import jax.numpy as jnp

    pix, adler, overflow = _png_fused_packed_jit()(
        jnp.asarray(buf), metas, slots=plan.slots, n_seg=n_seg,
        out_size=plan.out_size, h=info.height, w=info.width,
        bpp=info.bpp, expand_rgb=(ct == C.PNG_COLOR_RGB),
        interpret=not on_tpu,
    )
    pix_np = np.asarray(pix)
    plog.mark("device+readback")
    if not plan.slots_exact and bool(overflow):  # pragma: no cover
        raise png_codec.PngError("tape overflow (non-exact scanner bound)")
    if verify_adler:
        (expected,) = struct.unpack_from(
            ">I", chunks.idat, len(chunks.idat) - 4)
        if int(adler) != expected:
            raise png_codec.PngError("IDAT Adler-32 mismatch")
    if ct in (C.PNG_COLOR_RGBA, C.PNG_COLOR_RGB):
        rgba = pix_np.reshape(info.height, info.width, 4)
    else:
        rgba = png_codec.expand_to_rgba(
            pix_np, info, chunks.palette, chunks.trns
        )
    plog.done(w=info.width, h=info.height, color_type=ct,
              crc="ok" if verify_crc else "skipped",
              adler="ok" if verify_adler else "skipped")
    return rgba


def _decode_png_device_unfused(chunks, info, plog, verify_adler=True):
    """Fallback device path (no fused plan): separate dispatches."""
    from debigulator_tpu.ops.inflate_v3 import inflate_device_v3_dev

    body, out_size = inflate_device_v3_dev(chunks.idat[2:])
    plog.mark("inflate")
    expected_size = info.height * (1 + info.stride)
    if out_size != expected_size:
        raise png_codec.PngError(
            f"decompressed size {out_size} != expected {expected_size}"
        )
    raw_dev = body[:out_size]
    if verify_adler:
        (expected,) = struct.unpack_from(
            ">I", chunks.idat, len(chunks.idat) - 4)
        got = int(ck.adler32_device(raw_dev))
        if got != expected:
            raise png_codec.PngError("IDAT Adler-32 mismatch")
        plog.mark("adler")
    import jax

    from debigulator_tpu.ops.unfilter_pallas import (
        MAX_SKEW_BYTES,
        skew_bytes,
        unfilter_wavefront_pallas,
    )

    on_tpu = jax.default_backend() not in ("cpu",)
    force = bool(__import__("os").environ.get("DBG_FORCE_FUSED_PNG"))
    if ((on_tpu or force) and skew_bytes(
            info.height, info.width, info.bpp) <= MAX_SKEW_BYTES):
        import jax.numpy as jnp

        recon = unfilter_wavefront_pallas(
            raw_dev.astype(jnp.uint8), info.height, info.width, info.bpp,
            interpret=not on_tpu)
    else:
        recon = unfilter_device(
            raw_dev, info.height, info.width, info.bpp, as_numpy=False
        )
    plog.mark("unfilter")
    ct = info.color_type
    if ct == C.PNG_COLOR_RGBA:
        rgba = np.asarray(recon).reshape(info.height, info.width, 4)
    elif ct == C.PNG_COLOR_RGB:
        rgba = np.asarray(_expand_rgb_jit(recon, info.height, info.width))
    else:
        rgba = png_codec.expand_to_rgba(
            np.asarray(recon), info, chunks.palette, chunks.trns
        )
    plog.mark("expand")
    plog.done(w=info.width, h=info.height, color_type=info.color_type,
              adler="ok" if verify_adler else "skipped")
    return rgba


_PNG_SLICE_FUSED = None


def _png_slice_fused(body, off, *, size, h, w, bpp, expand_rgb, interpret):
    """Per-image tail of the corpus pipeline: dynamic-slice one image's
    raw scanlines out of the merged inflate body, Adler-32 it, Pallas
    wavefront unfilter, optional RGB->RGBA expand — one dispatch per
    image, nothing returns to the host in between."""
    import jax.numpy as jnp
    from jax import lax

    from debigulator_tpu.ops.checksum import adler32_jnp
    from debigulator_tpu.ops.unfilter_pallas import unfilter_wavefront_pallas

    raw = lax.dynamic_slice_in_dim(body, off, size)
    adler = adler32_jnp(raw, size)
    recon = unfilter_wavefront_pallas(
        raw.astype(jnp.uint8), h, w, bpp, interpret=interpret)
    if expand_rgb:
        r3 = recon.reshape(h, w, 3)
        recon = jnp.concatenate(
            [r3, jnp.full((h, w, 1), 255, r3.dtype)], axis=2
        ).reshape(h, w * 4)
    return recon, adler


def _png_slice_fused_jit():
    global _PNG_SLICE_FUSED
    if _PNG_SLICE_FUSED is None:
        import functools

        import jax

        _PNG_SLICE_FUSED = functools.partial(
            jax.jit,
            static_argnames=("size", "h", "w", "bpp", "expand_rgb",
                             "interpret"),
        )(_png_slice_fused)
    return _PNG_SLICE_FUSED


_PNG_SLICE_MULTI = None


def _png_slice_fused_multi(body, offs, *, size, h, w, bpp, expand_rgb,
                           interpret):
    """All same-shape images of a merged body in ONE dispatch (lax.scan
    over their offsets — each per-image dispatch costs ~21 ms of tunnel
    latency, and corpora bucket heavily by shape, e.g. the five fs_*
    713x1040 images)."""
    from jax import lax

    def step(_, off):
        return 0, _png_slice_fused(body, off, size=size, h=h, w=w, bpp=bpp,
                                   expand_rgb=expand_rgb,
                                   interpret=interpret)

    _, (pix, adler) = lax.scan(step, 0, offs)
    return pix, adler


def _png_slice_multi_jit():
    global _PNG_SLICE_MULTI
    if _PNG_SLICE_MULTI is None:
        import functools

        import jax

        _PNG_SLICE_MULTI = functools.partial(
            jax.jit,
            static_argnames=("size", "h", "w", "bpp", "expand_rgb",
                             "interpret"),
        )(_png_slice_fused_multi)
    return _PNG_SLICE_MULTI


def decode_png_corpus_device(datas: list[bytes], verify_crc: bool = True,
                             verify_adler: bool = True,
                             as_numpy: bool = True):
    """Corpus PNG decode, device-resident end to end (BASELINE config 3).

    ONE merged inflate call decodes every image's IDAT stream (threaded
    host scan, fused Pallas Phase A + v15 Phase B), then each image gets
    one fused slice -> Adler -> wavefront-unfilter -> expand dispatch on
    the still-resident body; all Adler words verify in a SINGLE stacked
    readback.  Compare reference decode_png.c:1430-1507 (per-image
    serial triple loop, ~49 MB/s aggregate on this corpus).

    as_numpy=False returns the per-image device arrays (pre color
    expansion for palette/gray images) — the bench's device-resident
    timing hook.  Falls back to decode_png_batch when the native scanner
    or the fused kernels can't cover an input.
    """
    import jax
    import jax.numpy as jnp

    from debigulator_tpu.ops.scanner import _get_native
    from debigulator_tpu.ops.unfilter_pallas import MAX_SKEW_BYTES, skew_bytes
    from debigulator_tpu.parallel.merged import build_merged_plan, run_merged_plan

    on_tpu = jax.default_backend() not in ("cpu",)
    force = bool(__import__("os").environ.get("DBG_FORCE_FUSED_PNG"))
    parsed = [png_codec.parse_chunks(d, verify_crc=verify_crc) for d in datas]
    for ch in parsed:
        parse_zlib_header(ch.idat)
    fits = all(
        skew_bytes(ch.info.height, ch.info.width, ch.info.bpp)
        <= MAX_SKEW_BYTES
        for ch in parsed
    )
    if _get_native() is None or not fits or not (on_tpu or force):
        return decode_png_batch(datas, verify_crc=verify_crc)

    from debigulator_tpu.ops import inflate_v3 as v3
    from debigulator_tpu.ops.phase_a_pallas import pa_coverable
    from debigulator_tpu.ops.scanner import scan_stream_cells

    plog = PhaseLog("png.decode_corpus_device")
    streams = [ch.idat[2:] for ch in parsed]

    # Per-stream scan + plan (threaded; the native scanner releases the
    # GIL), then partition by Phase A coverage: block-dense streams
    # (tiles spanning more than one table page) decode individually via
    # decode_png_device's internal fallback instead of dragging the
    # whole batch off the flagship path.
    def scan_one(s):
        sc = scan_stream_cells(s, v3.CELL_BITS)
        return sc, v3.build_plan_v3(s, sc[0], sc[1], cells=sc[2])

    if len(streams) > 1:
        import concurrent.futures as cf
        import os as _os

        _get_native()
        workers = min(len(streams), max(2, _os.cpu_count() or 2))
        with cf.ThreadPoolExecutor(max_workers=workers) as pool:
            scans = list(pool.map(scan_one, streams))
    else:
        scans = [scan_one(streams[0])]
    cover = [pa_coverable(pl) for _, pl in scans]

    # Chunk the merged batch under the v15 run-meta lit-row bound
    # (2^18 slots-packed lit rows per call); 2x margin covers the
    # merged plan's global pow2 bit rounding.  Cell counts come from the
    # plan's TRUE used extent (block cell-alignment can exceed the raw
    # byte length on flush-heavy streams).  A stream whose lit-tape
    # footprint alone exceeds the cap routes to the per-image fallback
    # below instead of crashing the merged call (ADVICE item 4).
    from debigulator_tpu.ops.phase_a_pallas import TC

    cap = 1 << 18
    for i, c in enumerate(cover):
        if not c:
            continue
        cells_i = -(-scans[i][1].used_bits // (TC * v3.CELL_BITS)) * TC
        if 2 * cells_i * scans[i][1].slots // 128 > cap:
            cover[i] = False
    idx_a = [i for i, c in enumerate(cover) if c]
    if not idx_a:
        return decode_png_batch(datas, verify_crc=verify_crc)

    chunks, cur, cur_cells, cur_slots = [], [], 0, 1
    for i in idx_a:
        cells_i = -(-scans[i][1].used_bits // (TC * v3.CELL_BITS)) * TC
        new_slots = max(cur_slots, scans[i][1].slots)
        if cur and 2 * (cur_cells + cells_i) * new_slots // 128 > cap:
            chunks.append(cur)
            cur, cur_cells, cur_slots = [], 0, 1
            new_slots = scans[i][1].slots
        cur.append(i)
        cur_cells += cells_i
        cur_slots = new_slots
    chunks.append(cur)
    plog.mark("scan")

    pix_map, adlers, adler_idx = {}, [], []

    def _build(chunk):
        """FULL host prep for one chunk — merged plan, Phase A arrays,
        packed staging buffer — so it all overlaps the previous chunk's
        staging + (async) device dispatches."""
        from debigulator_tpu.ops.phase_a_pallas import build_pa_arrays

        mp = build_merged_plan([streams[i] for i in chunk],
                               records=False,
                               scanned=[scans[i][0] for i in chunk])
        plan = mp.plan
        packed = None
        if plan.exact_entries and plan.slots_exact:
            pa_np = build_pa_arrays(plan, stage=False)
            if pa_np is not None:
                buf, metas = v3.pack_stage_arrays(pa_np, plan)
                n_seg = v3._round_pow2(
                    max(1, -(-plan.out_size // v3.SEG_BYTES)), 1)
                # Stage from the prep thread too: the next chunk's h2d
                # transfer rides behind this chunk's device work.
                packed = (jnp.asarray(buf), metas, n_seg)
        return mp, packed

    import concurrent.futures as cf

    pool = cf.ThreadPoolExecutor(1)
    fut = pool.submit(_build, chunks[0])
    for ci, chunk in enumerate(chunks):
        # Chunk i+1's host plan build overlaps chunk i's staging and
        # (async) device dispatches.
        mp, packed = fut.result()
        if ci + 1 < len(chunks):
            fut = pool.submit(_build, chunks[ci + 1])
        # Bucket the chunk's images by fused-kernel shape; the ENTIRE
        # chunk — merged inflate of every stream plus every bucket's
        # slice/Adler/unfilter/expand — runs as ONE device dispatch
        # (each extra dispatch costs ~21 ms of tunnel latency, and the
        # round-4 path paid one per image).
        buckets: dict = {}
        for k, (i, size) in enumerate(zip(chunk, mp.out_sizes)):
            info = parsed[i].info
            expected_size = info.height * (1 + info.stride)
            if size != expected_size:
                raise png_codec.PngError(
                    f"decompressed size {size} != expected {expected_size}"
                )
            key = (size, info.height, info.width, info.bpp,
                   info.color_type == C.PNG_COLOR_RGB)
            buckets.setdefault(key, []).append((i, mp.out_offsets[k]))
        # (Measured on chip: fusing the merged inflate + every bucket
        # into ONE jit was ~25% SLOWER than per-bucket dispatches — XLA
        # schedules the mega-graph worse; per-bucket it is.)
        if packed is not None:
            dev_buf, metas, n_seg = packed
            body, _ = v3._inflate_v15_packed_jit(
                dev_buf, metas, mp.plan.slots, n_seg,
                interpret=not on_tpu)
        else:
            body = run_merged_plan(mp)
        for (size, h, w, bpp, expand), members in buckets.items():
            offs_dev = jnp.asarray(
                np.asarray([off for _, off in members], np.int32))
            pix, adler = _png_slice_multi_jit()(
                body, offs_dev, size=size, h=h, w=w, bpp=bpp,
                expand_rgb=expand, interpret=not on_tpu,
            )
            for j, (i, _) in enumerate(members):
                pix_map[i] = pix[j]
                adlers.append(adler[j])
                adler_idx.append(i)
    # Block-dense leftovers (e.g. flush-per-scanline encodes: ~800
    # blocks in 5 KB): tiny streams that are pathological for every
    # device path — decode them with the native serial inflate + host
    # unfilter (sub-ms at these sizes; verifies Adler internally).
    if not all(cover):
        from debigulator_tpu.native.scanner import inflate_native

        for i, c in enumerate(cover):
            if not c:
                pix_map[i] = png_codec.decode_png(
                    datas[i], verify_crc=False,
                    verify_adler=verify_adler,
                    inflate_fn=inflate_native)
    pool.shutdown(wait=False)
    plog.mark("dispatch")
    if verify_adler and adlers:
        got = np.asarray(jnp.stack(adlers))  # ONE readback for the batch
        for i, g in zip(adler_idx, got):
            (expected,) = struct.unpack_from(
                ">I", parsed[i].idat, len(parsed[i].idat) - 4)
            if int(g) != expected:
                raise png_codec.PngError("IDAT Adler-32 mismatch")
        plog.mark("adler")
    if not as_numpy:
        return [pix_map[i] for i in range(len(datas))]
    images = []
    for i, ch in enumerate(parsed):
        info = ch.info
        pix = pix_map[i]
        if cover[i]:
            pix_np = np.asarray(pix)
            if info.color_type in (C.PNG_COLOR_RGBA, C.PNG_COLOR_RGB):
                images.append(pix_np.reshape(info.height, info.width, 4))
            else:
                images.append(
                    png_codec.expand_to_rgba(
                        pix_np, info, ch.palette, ch.trns)
                )
        else:
            images.append(np.asarray(pix))
    plog.done(images=len(images))
    return images


def decode_png_batch(datas: list[bytes], mesh=None, verify_crc: bool = True):
    """Batch PNG decode: all IDAT streams inflate as ONE batched device
    call (dp-sharded when a mesh is given), then per-image unfilter.

    This is the corpus bench path (BASELINE.json config 3): the batch is
    the unit of data parallelism, outputs return in input order.

    Single-device batches route through the flagship merged pipeline
    (one fused v13 device call for ALL IDAT streams); a mesh selects the
    dp-sharded path instead.
    """
    from debigulator_tpu.parallel.batch import decode_batch_device

    parsed = [png_codec.parse_chunks(d, verify_crc=verify_crc) for d in datas]
    for ch in parsed:
        parse_zlib_header(ch.idat)
    streams = [ch.idat[2:] for ch in parsed]
    if mesh is None:
        from debigulator_tpu.ops.scanner import _get_native
        from debigulator_tpu.parallel.merged import decode_merged

        if _get_native() is not None:
            raws = decode_merged(streams)
        else:
            raws = decode_batch_device(streams, mesh=None)
    else:
        raws = decode_batch_device(streams, mesh=mesh)
    images = []
    for ch, raw in zip(parsed, raws):
        info = ch.info
        expected_size = info.height * (1 + info.stride)
        if len(raw) != expected_size:
            raise png_codec.PngError(
                f"decompressed size {len(raw)} != expected {expected_size}"
            )
        recon = unfilter_device(
            np.frombuffer(raw, np.uint8), info.height, info.width, info.bpp
        )
        images.append(
            png_codec.expand_to_rgba(np.asarray(recon), info, ch.palette, ch.trns)
        )
    return images


@dataclasses.dataclass
class DecodeResult:
    """Batch decode result entry (good-flag error model like the reference,
    decode_png.h:91-94, but per item instead of global)."""

    name: str
    good: bool
    data: np.ndarray | bytes | None
    error: str | None = None


def decode_corpus(paths, device: bool = True,
                  manifest_path: str | None = None) -> list[DecodeResult]:
    """Decode a mixed list of .png/.gz/.bmp files (the concat_pngs.c /
    batch analog).  One bad file poisons only its own entry.

    manifest_path: optional persisted completed-items manifest (SURVEY
    §5.4): items already recorded good are skipped (returned with
    data=None and good=True), and every completion appends a durable
    row — a restarted job resumes at the remainder."""
    manifest = None
    if manifest_path is not None:
        from debigulator_tpu.utils.manifest import JobManifest

        manifest = JobManifest(manifest_path)
    results = []
    for path in paths:
        path = str(path)
        name = path.rsplit("/", 1)[-1]
        if manifest is not None and name in manifest \
                and manifest.entry(name)["good"]:
            # Only successful completions skip; failures retry.
            results.append(DecodeResult(name, True, None,
                                        "skipped: already completed"))
            continue
        try:
            blob = open(path, "rb").read()
            if name.endswith(".png"):
                img = decode_png_device(blob) if device else png_codec.decode_png(blob)
                results.append(DecodeResult(name, True, img))
            elif name.endswith(".gz"):
                out = decode_gzip_device(blob) if device else None
                if out is None:
                    from debigulator_tpu.models.gzip_codec import decode_gzip

                    out = decode_gzip(blob)
                results.append(DecodeResult(name, True, out))
            elif name.endswith(".bmp"):
                from debigulator_tpu.models.bmp_codec import decode_bmp

                results.append(DecodeResult(name, True, decode_bmp(blob)))
            else:
                results.append(DecodeResult(name, False, None, "unknown format"))
        except Exception as e:  # noqa: BLE001 — per-item failure isolation
            results.append(DecodeResult(name, False, None, f"{type(e).__name__}: {e}"))
        if manifest is not None:
            r = results[-1]
            d = r.data
            size = (d.nbytes if hasattr(d, "nbytes")
                    else len(d) if d is not None else 0)
            manifest.record(name, r.good, size=size,
                            crc32=ck.crc32(bytes(d.tobytes()
                                                 if hasattr(d, "tobytes")
                                                 else d)) if d is not None
                            else 0)
    return results
