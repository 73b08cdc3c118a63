"""P-slice (inter) tests for the H.264 codec subset (round 13).

The motion-compensation cross-check is genuinely independent of
operators/h264.py's implementation: the center half-pel j is computed by
the OTHER filtering order the spec proves equivalent (horizontal 6-tap
over vertical intermediates, 8.4.2.2.1's "both orders yield the same
result"), and the twelve quarter positions come from a 4x-grid adjacency
table instead of nested conditionals."""

import pytest

from cassandra_spark.operators import h264
from cassandra_spark.operators.h264 import (
    BitWriter,
    Sps,
    decode_frame,
    decode_idr,
    decode_p,
    encode_idr,
    encode_p,
    mc_chroma,
    mc_luma,
    nal,
    parse_sps,
    write_sps,
)


def _synth(w, h, seed):
    y = [[(x * 3 + yy * 7 + seed * 11) % 256 for x in range(w)]
         for yy in range(h)]
    cb = [[(x * 5 + yy * 2 + seed) % 256 for x in range(w // 2)]
          for yy in range(h // 2)]
    cr = [[(x + yy * 9 + seed * 3) % 256 for x in range(w // 2)]
          for yy in range(h // 2)]
    return y, cb, cr


def _shift_noise(plane, dx, dy, noise=0, step=7):
    h, w = len(plane), len(plane[0])
    return [
        [
            (
                plane[min(h - 1, max(0, yy - dy))][min(w - 1, max(0, x - dx))]
                + (noise if (x + yy) % step == 0 else 0)
            ) % 256
            for x in range(w)
        ]
        for yy in range(h)
    ]


def test_cbp_inter_table_structure():
    """Table 9-4 inter column: a permutation of 0..47 whose most
    probable code (codeNum 0) is the empty cbp and whose next ranks are
    the single-quadrant / chroma-DC patterns."""
    assert sorted(h264.CBP_INTER_ME) == list(range(48))
    assert h264.CBP_INTER_ME[0] == 0
    assert h264.CBP_INTER_ME[1] == 16          # chroma DC only
    assert set(h264.CBP_INTER_ME[2:6]) == {1, 2, 4, 8}  # one luma quad
    assert all(
        h264.CBP_INTER_INV[v] == i for i, v in enumerate(h264.CBP_INTER_ME)
    )


def _clip255(v):
    return 0 if v < 0 else 255 if v > 255 else v


def _independent_mc_luma(ref, px, py, mvx, mvy, bw, bh):
    h, w = len(ref), len(ref[0])

    def P(x, y):
        return ref[0 if y < 0 else h - 1 if y >= h else y][
            0 if x < 0 else w - 1 if x >= w else x
        ]

    def V1(x, y):  # vertical 6-tap intermediate
        return (P(x, y - 2) - 5 * P(x, y - 1) + 20 * P(x, y)
                + 20 * P(x, y + 1) - 5 * P(x, y + 2) + P(x, y + 3))

    def H1(x, y):  # horizontal 6-tap intermediate
        return (P(x - 2, y) - 5 * P(x - 1, y) + 20 * P(x, y)
                + 20 * P(x + 1, y) - 5 * P(x + 2, y) + P(x + 3, y))

    def val4x(qx, qy):
        """Sample at EVEN 4x-grid coordinates (int or half positions)."""
        x, y, fx, fy = qx >> 2, qy >> 2, qx & 3, qy & 3
        if fx == 0 and fy == 0:
            return P(x, y)
        if fx == 2 and fy == 0:
            return _clip255((H1(x, y) + 16) >> 5)
        if fx == 0 and fy == 2:
            return _clip255((V1(x, y) + 16) >> 5)
        # j by the OTHER order: horizontal 6-tap over verticals
        j1 = (V1(x - 2, y) - 5 * V1(x - 1, y) + 20 * V1(x, y)
              + 20 * V1(x + 1, y) - 5 * V1(x + 2, y) + V1(x + 3, y))
        return _clip255((j1 + 512) >> 10)

    # quarter positions -> the two even-grid points they average
    # (Table 8-12 restated as 4x-grid adjacency; e/g/p/r are diagonal)
    adj = {
        (1, 0): ((0, 0), (2, 0)), (3, 0): ((2, 0), (4, 0)),
        (0, 1): ((0, 0), (0, 2)), (0, 3): ((0, 2), (0, 4)),
        (2, 1): ((2, 0), (2, 2)), (2, 3): ((2, 2), (2, 4)),
        (1, 2): ((0, 2), (2, 2)), (3, 2): ((2, 2), (4, 2)),
        (1, 1): ((2, 0), (0, 2)), (3, 1): ((2, 0), (4, 2)),
        (1, 3): ((0, 2), (2, 4)), (3, 3): ((4, 2), (2, 4)),
    }
    out = []
    for i in range(bh):
        row = []
        for j in range(bw):
            qx = 4 * (px + j) + mvx
            qy = 4 * (py + i) + mvy
            fx, fy = qx & 3, qy & 3
            bx, by = qx - fx, qy - fy
            if fx % 2 == 0 and fy % 2 == 0:  # integer or half position
                row.append(val4x(qx, qy))
            else:
                (d1, e1), (d2, e2) = adj[(fx, fy)]
                row.append(
                    (val4x(bx + d1, by + e1) + val4x(bx + d2, by + e2) + 1)
                    >> 1
                )
        out.append(row)
    return out


def test_mc_luma_all_16_fractional_classes_vs_independent():
    ref = [[(x * 13 + y * 31 + (x * y) % 17) % 256 for x in range(24)]
           for y in range(24)]
    for mvx in range(-5, 7):
        for mvy in range(-6, 6):
            got = mc_luma(ref, 4, 4, mvx, mvy, 8, 8)
            want = _independent_mc_luma(ref, 4, 4, mvx, mvy, 8, 8)
            assert got == want, (mvx, mvy)


def test_mc_luma_integer_shift_and_edge_extension():
    ref = [[(x + 10 * y) % 256 for x in range(20)] for y in range(20)]
    # pure integer motion is a plain (clipped) shift
    got = mc_luma(ref, 8, 8, -8, 12, 4, 4)
    assert got == [[ref[11 + i][6 + j] for j in range(4)] for i in range(4)]
    # off-frame reads clamp to the border sample
    got = mc_luma(ref, 0, 0, -400, -400, 2, 2)
    assert got == [[ref[0][0]] * 2, [ref[0][0]] * 2]


def test_mc_chroma_bilinear_weights():
    plane = [[(x * 7 + y * 3) % 256 for x in range(12)] for y in range(12)]
    # integer (multiple of 8) vector: plain shift
    assert mc_chroma(plane, 2, 2, 16, -8, 2, 2) == [
        [plane[1][4], plane[1][5]], [plane[2][4], plane[2][5]],
    ]
    # hand-checked eighth-pel weights at (3, 5)
    fx, fy = 3, 5
    a, b = plane[2][2], plane[2][3]
    c, d = plane[3][2], plane[3][3]
    want = ((8 - fx) * (8 - fy) * a + fx * (8 - fy) * b
            + (8 - fx) * fy * c + fx * fy * d + 32) >> 6
    assert mc_chroma(plane, 2, 2, 3, 5, 1, 1) == [[want]]


def _paint_mb(st, mbx, mby, mv):
    h264._mv_paint(st, mbx * 4, mby * 4, 4, 4, mv)


def test_mv_prediction_rules():
    st = h264._FrameState(64, 48)  # 4 x 3 MBs
    # row 0, A available only -> mvp = mvA
    _paint_mb(st, 0, 0, (8, -4))
    assert h264._mv_pred_16x16(st, 1, 0) == (8, -4)
    # interior: single refIdx-0 match wins outright (A inter, B/C intra)
    for x in range(4):
        _paint_mb(st, x, 0, None)
    _paint_mb(st, 0, 1, (12, 6))
    assert h264._mv_pred_16x16(st, 1, 1) == (12, 6)
    # interior: three inter neighbors -> componentwise median
    for x, mv in enumerate([(0, 0), (2, 10), (40, -2), None]):
        _paint_mb(st, x, 0, mv)
    assert h264._mv_pred_16x16(st, 1, 1) == (12, 6)  # med(12,2,40), med(6,10,-2)
    # C unavailable at the right edge -> D substitution
    for x, mv in enumerate([(1, 1), (2, 2), (3, 3), (4, 4)]):
        _paint_mb(st, x, 0, mv)
    for x, mv in enumerate([(5, 5), (6, 6), (7, 7)]):
        _paint_mb(st, x, 1, mv)
    assert h264._mv_pred_16x16(st, 3, 1) == (4, 4)  # med(7,4,3) / same
    # skip: zero when an edge neighbor is missing
    assert h264._mv_pred_skip(st, 0, 1) == (0, 0)
    assert h264._mv_pred_skip(st, 2, 0) == (0, 0)
    # skip: zero when A or B is a zero-motion inter MB
    _paint_mb(st, 1, 1, (0, 0))
    assert h264._mv_pred_skip(st, 2, 1) == (0, 0)
    # skip: otherwise the 16x16 prediction (intra neighbor ≠ zero-mv)
    _paint_mb(st, 1, 1, (9, 9))
    _paint_mb(st, 2, 0, None)
    got = h264._mv_pred_skip(st, 2, 1)
    assert got == h264._mv_pred_16x16(st, 2, 1) != (0, 0)


def test_mv_prediction_partition_directional_rules():
    """8.4.1.3.2: 16x8 top <- B, bottom <- A; 8x16 left <- A, right <-
    C — each taken ONLY when that neighbor is inter (refIdx 0), else
    falling back to the general rule. With block granularity, a
    partition's neighbor can be the sibling partition of the SAME MB."""
    st = h264._FrameState(64, 48)
    # surround MB (1,1): left inter, above inter, above-right inter
    _paint_mb(st, 0, 1, (10, 1))   # A side
    _paint_mb(st, 1, 0, (20, 2))   # B side
    _paint_mb(st, 2, 0, (30, 3))   # C side
    bx0, by0 = 4, 4
    # 16x8 top takes B outright
    assert h264._mv_pred_part(st, bx0, by0, 4, 2, "16x8", 0) == (20, 2)
    # paint the top partition; the bottom takes A (left MB), not the top
    h264._mv_paint(st, bx0, by0, 4, 2, (20, 2))
    assert h264._mv_pred_part(st, bx0, by0 + 2, 4, 2, "16x8", 1) == (10, 1)
    # 8x16 left takes A; right takes C (above-right of its top-right)
    st2 = h264._FrameState(64, 48)
    _paint_mb(st2, 0, 1, (10, 1))
    _paint_mb(st2, 1, 0, (20, 2))
    _paint_mb(st2, 2, 0, (30, 3))
    assert h264._mv_pred_part(st2, bx0, by0, 2, 4, "8x16", 0) == (10, 1)
    h264._mv_paint(st2, bx0, by0, 2, 4, (10, 1))
    assert h264._mv_pred_part(st2, bx0 + 2, by0, 2, 4, "8x16", 1) == (30, 3)
    # directional neighbor INTRA -> general rule. For the 16x8 top with
    # B intra: A=(10,1) and C=(30,3) inter, median over A/B/C with B as
    # (0,0) -> (med(10,0,30), med(1,0,3)) = (10, 1)
    st3 = h264._FrameState(64, 48)
    _paint_mb(st3, 0, 1, (10, 1))
    _paint_mb(st3, 1, 0, None)
    _paint_mb(st3, 2, 0, (30, 3))
    assert h264._mv_pred_part(st3, bx0, by0, 4, 2, "16x8", 0) == (10, 1)


def test_p_partition_roundtrip_both_shapes():
    """16x8 and 8x16 partitioned MBs round-trip byte-exact, with
    different per-partition motion found by the search."""
    sps = parse_sps(write_sps(48, 32, num_ref_frames=1))
    y0, cb0, cr0 = _synth(48, 32, 11)
    _, ref = encode_idr(y0, cb0, cr0, qp=22)
    for qp in (18, 30):
        y1 = _shift_noise(ref[0], 2, 1, noise=8, step=4)
        parts = {(0, 0): "16x8", (1, 1): "8x16", (2, 0): "16x8"}
        nal_b, recon = encode_p(
            y1, ref[1], ref[2], ref, qp=qp, mv_hint=(9, 5),
            partition_mbs=parts,
        )
        assert decode_p(nal_b, sps, qp, ref) == recon, qp
    # partitions mixed with intra MBs and skip in one slice
    nal_b, recon = encode_p(
        ref[0], ref[1], ref[2], ref, qp=24,
        partition_mbs={(1, 0): "8x16"}, intra_mbs={(2, 1)},
    )
    assert decode_p(nal_b, sps, 24, ref) == recon


def test_p_roundtrip_every_fractional_hint_class():
    """encode_p/decode_p agree byte-exact across qp and all four
    quarter-pel phase classes on each axis."""
    sps = parse_sps(write_sps(32, 32, num_ref_frames=1))
    y0, cb0, cr0 = _synth(32, 32, 5)
    _, ref = encode_idr(y0, cb0, cr0, qp=20)
    for qp in (14, 26, 34):
        for hint in ((0, 0), (5, 2), (2, 7), (3, 3), (-6, 1), (4, -9)):
            y1 = _shift_noise(ref[0], 1, 1, noise=9, step=5)
            cb1 = _shift_noise(ref[1], 1, 0)
            cr1 = _shift_noise(ref[2], 0, 1)
            nal_b, recon = encode_p(
                y1, cb1, cr1, ref, qp=qp, frame_num=1, mv_hint=hint
            )
            assert decode_p(nal_b, sps, qp, ref) == recon, (qp, hint)


def test_p_skip_runs_including_trailing():
    """A static frame codes as one all-skip run (4-byte slice) and
    reconstructs identical to the reference; a frame whose LAST MBs are
    static exercises the trailing mb_skip_run."""
    sps = parse_sps(write_sps(48, 32, num_ref_frames=1))
    y0, cb0, cr0 = _synth(48, 32, 2)
    _, ref = encode_idr(y0, cb0, cr0, qp=22)
    nal_b, recon = encode_p(ref[0], ref[1], ref[2], ref, qp=22)
    assert len(nal_b) <= 6
    assert decode_p(nal_b, sps, 22, ref) == recon == ref
    # change only the top-left MB: the trailing 5 MBs are a run
    y1 = [row[:] for row in ref[0]]
    for i in range(16):
        for j in range(16):
            y1[i][j] = (y1[i][j] + 40) % 256
    nal_b, recon = encode_p(y1, ref[1], ref[2], ref, qp=22)
    got = decode_p(nal_b, sps, 22, ref)
    assert got == recon
    assert got[0] != ref[0] and [r[16:] for r in got[0]] == [
        r[16:] for r in ref[0]
    ]


def test_p_intra_macroblocks_both_modes():
    sps = parse_sps(write_sps(32, 32, num_ref_frames=1))
    y0, cb0, cr0 = _synth(32, 32, 7)
    _, ref = encode_idr(y0, cb0, cr0, qp=24)
    y1 = _shift_noise(ref[0], 2, 0, noise=11, step=3)
    for mode in ("i16", "i4"):
        nal_b, recon = encode_p(
            y1, ref[1], ref[2], ref, qp=24, mv_hint=(8, 0),
            intra_mbs={(0, 0), (1, 1)}, intra_mode=mode,
        )
        assert decode_p(nal_b, sps, 24, ref) == recon, mode


def test_p_gates():
    sps = parse_sps(write_sps(16, 16, num_ref_frames=1))
    y, cb, cr = _synth(16, 16, 1)
    idr_nal, ref = encode_idr(y, cb, cr, qp=26)
    # decode_frame dispatch: P NAL without a reference is an error
    p_nal, _ = encode_p(y, cb, cr, ref, qp=26)
    with pytest.raises(ValueError, match="previous decoded picture"):
        decode_frame(p_nal, sps, 26)
    # an IDR NAL handed to decode_p is gated
    with pytest.raises(NotImplementedError, match="non-IDR"):
        decode_p(idr_nal, sps, 26, ref)
    # an out-of-range intra mb_type inside a P slice is corrupt
    w = BitWriter()
    w.ue(0)        # first_mb_in_slice
    w.ue(5)        # slice_type P
    w.ue(0)        # pps
    w.u(1, 4)      # frame_num
    w.u(0, 1)
    w.u(0, 1)
    w.u(0, 1)
    w.se(0)
    w.ue(1)        # deblocking off
    w.ue(0)        # mb_skip_run
    w.ue(31)       # intra mb_type 26: only 0..25 exist (Table 7-11)
    w.rbsp_trailing()
    with pytest.raises(ValueError, match="invalid I-slice mb_type"):
        decode_p(nal(1, w.tobytes(), ref_idc=2), sps, 26, ref)
    # a skip run past the slice end is corrupt, not gated
    w = BitWriter()
    w.ue(0)
    w.ue(5)
    w.ue(0)
    w.u(1, 4)
    w.u(0, 1)
    w.u(0, 1)
    w.u(0, 1)
    w.se(0)
    w.ue(1)
    w.ue(9)        # 9 skips in a 1-MB picture
    w.rbsp_trailing()
    with pytest.raises(ValueError, match="skip_run"):
        decode_p(nal(1, w.tobytes(), ref_idc=2), sps, 26, ref)


def test_gop_containers_roundtrip_and_sync_layout():
    from cassandra_spark.operators.mkv import (
        decode_mkv_frame,
        demux_mkv,
        encode_mkv_avc1,
    )
    from cassandra_spark.operators.mp4 import (
        _yuv420_to_rgb,
        decode_mp4_frame,
        demux_mp4,
        encode_mp4_avc1,
        is_sync_sample,
    )

    base = _synth(32, 32, 4)
    frames = [base]
    for k in range(1, 6):
        frames.append((
            _shift_noise(frames[-1][0], 1, 1, noise=6, step=4),
            _shift_noise(frames[-1][1], 1, 0),
            _shift_noise(frames[-1][2], 0, 1),
        ))
    hints = [(0, 0)] + [(5, 4)] * 5
    payload, recons = encode_mp4_avc1(
        32, 32, frames, fps=4, qp=21, gop=3, mv_hints=hints,
        intra_mbs={(1, 0)},
    )
    st = demux_mp4(payload)
    assert [i for i in range(6) if is_sync_sample(st, i)] == [0, 3]
    for i in range(6):
        assert decode_mp4_frame(st, i) == _yuv420_to_rgb(*recons[i]), i

    payload, recons = encode_mkv_avc1(
        32, 32, frames, fps=4, qp=21, gop=2, mv_hints=hints,
    )
    st = demux_mkv(payload)
    assert list(map(bool, st.keyframe)) == [True, False] * 3
    for i in range(6):
        assert decode_mkv_frame(st, i) == _yuv420_to_rgb(*recons[i]), i


def test_sps_num_ref_frames_roundtrip():
    sps = parse_sps(write_sps(32, 16, num_ref_frames=1))
    assert (sps.width, sps.height) == (32, 16)


def test_p_8x8_sub_partitions_roundtrip():
    """P_8x8 (mb_type 3): four sub_mb_type per MB; the encoder's
    rotation drives all four sub shapes (8x8/8x4/4x8/4x4) through the
    general block-granular prediction rule. Byte-exact round trip, alone
    and mixed with the other shapes, intra MBs and skippable content."""
    sps = parse_sps(write_sps(48, 32, num_ref_frames=1))
    y0, cb0, cr0 = _synth(48, 32, 6)
    _, ref = encode_idr(y0, cb0, cr0, qp=22)
    for qp in (16, 26, 36):
        y1 = _shift_noise(ref[0], 2, 1, noise=9, step=4)
        nal_b, recon = encode_p(
            y1, ref[1], ref[2], ref, qp=qp, mv_hint=(9, 5),
            partition_mbs={(0, 0): "8x8", (1, 1): "8x8",
                           (2, 0): "16x8", (1, 0): "8x16"},
        )
        assert decode_p(nal_b, sps, qp, ref) == recon, qp
    nal_b, recon = encode_p(
        ref[0], _shift_noise(ref[1], 1, 0), ref[2], ref, qp=24,
        partition_mbs={(x, y): "8x8" for x in range(3) for y in range(2)
                       if (x + y) % 2 == 0},
        intra_mbs={(2, 1)},
    )
    assert decode_p(nal_b, sps, 24, ref) == recon


def test_p_8x8_invalid_sub_mb_type_rejected():
    sps = parse_sps(write_sps(16, 16, num_ref_frames=1))
    y, cb, cr = _synth(16, 16, 1)
    _, ref = encode_idr(y, cb, cr, qp=26)
    w = BitWriter()
    w.ue(0)        # first_mb_in_slice
    w.ue(5)        # slice_type P
    w.ue(0)        # pps
    w.u(1, 4)      # frame_num
    w.u(0, 1)
    w.u(0, 1)
    w.u(0, 1)
    w.se(0)
    w.ue(1)        # deblocking off
    w.ue(0)        # mb_skip_run
    w.ue(3)        # mb_type P_8x8
    w.ue(4)        # sub_mb_type 4: only 0..3 are P sub types
    w.rbsp_trailing()
    with pytest.raises(ValueError, match="sub_mb_type"):
        decode_p(nal(1, w.tobytes(), ref_idc=2), sps, 26, ref)


def test_b_slice_roundtrip_all_modes():
    """B pictures (round 13): B_L0 / B_L1 / B_Bi 16x16 with default
    (averaging) bi-prediction, list-1 MV prediction over its own grid,
    intra-in-B (mb_type offset 23), POC type 0 headers. Byte-exact
    encoder/decoder agreement across qp."""
    from cassandra_spark.operators.h264 import decode_b, encode_b

    sps = parse_sps(write_sps(48, 32, num_ref_frames=2, poc_type=0))
    assert sps.poc_type == 0
    y0, cb0, cr0 = _synth(48, 32, 3)
    _, r0 = encode_idr(y0, cb0, cr0, qp=22, poc_lsb=0)
    y2 = _shift_noise(r0[0], 4, 2, noise=6)
    _, r2 = encode_p(
        y2, _shift_noise(r0[1], 2, 1), _shift_noise(r0[2], 2, 1), r0,
        qp=22, frame_num=1, mv_hint=(16, 8), poc_lsb=4,
    )
    y1 = _shift_noise(r0[0], 2, 1, noise=5)
    for qp in (16, 24, 34):
        nal_b, rb = encode_b(
            y1, _shift_noise(r0[1], 1, 0), _shift_noise(r0[2], 1, 0),
            r0, r2, qp=qp, frame_num=2, poc_lsb=2,
            mv_hint0=(8, 4), mv_hint1=(-8, -4),
            intra_mbs={(1, 1)} if qp == 24 else frozenset(),
        )
        assert (nal_b[0] >> 5) & 3 == 0  # non-reference picture
        assert decode_b(nal_b, sps, qp, r0, r2) == rb, qp
    # decode_frame dispatch: a B slice without both anchors is an error
    from cassandra_spark.operators.h264 import decode_frame, slice_kind

    nal_b, _ = encode_b(y1, r0[1], r0[2], r0, r2, qp=24, poc_lsb=2)
    assert slice_kind(nal_b, sps) == "B"
    with pytest.raises(ValueError, match="following anchor"):
        decode_frame(nal_b, sps, 24, ref_planes=r0)
    assert decode_frame(nal_b, sps, 24, ref_planes=r0, ref_next=r2)


def test_b_skip_and_direct_are_gated():
    from cassandra_spark.operators.h264 import decode_b

    sps = parse_sps(write_sps(16, 16, num_ref_frames=2, poc_type=0))
    y, cb, cr = _synth(16, 16, 1)
    _, ref = encode_idr(y, cb, cr, qp=26, poc_lsb=0)

    def b_header(w):
        w.ue(0)        # first_mb_in_slice
        w.ue(6)        # slice_type B
        w.ue(0)        # pps
        w.u(1, 4)      # frame_num
        w.u(2, 8)      # pic_order_cnt_lsb
        w.u(1, 1)      # direct_spatial_mv_pred_flag
        w.u(0, 1)
        w.u(0, 1)
        w.u(0, 1)
        w.se(0)
        w.ue(1)        # deblocking off

    w = BitWriter()
    b_header(w)
    w.ue(1)            # mb_skip_run = 1 -> B_Skip (direct prediction)
    w.rbsp_trailing()
    with pytest.raises(NotImplementedError, match="B_Skip"):
        decode_b(nal(1, w.tobytes(), ref_idc=0), sps, 26, ref, ref)
    w = BitWriter()
    b_header(w)
    w.ue(0)            # mb_skip_run
    w.ue(0)            # mb_type B_Direct_16x16
    w.rbsp_trailing()
    with pytest.raises(NotImplementedError, match="direct mode"):
        decode_b(nal(1, w.tobytes(), ref_idc=0), sps, 26, ref, ref)


def test_bgop_containers_roundtrip_and_reordering():
    """Closed B GOPs in both containers: decode order differs from
    display order (mp4 ctts / mkv presentation timestamps), every
    sample decodes byte-exact incl. seeks straight to B frames, and the
    slot before each IDR is a NON-reference P (closed GOP — a B may
    not reference across an IDR, whose arrival resets the DPB)."""
    from cassandra_spark.operators.h264 import parse_avcc, slice_kind, split_avcc_sample
    from cassandra_spark.operators.mkv import (
        decode_mkv_frame,
        demux_mkv,
        encode_mkv_avc1_bgop,
    )
    from cassandra_spark.operators.mp4 import (
        _yuv420_to_rgb,
        decode_mp4_frame,
        demux_mp4,
        encode_mp4_avc1_bgop,
        is_sync_sample,
    )

    base = _synth(32, 32, 4)
    frames = [base]
    for k in range(1, 9):
        frames.append((
            _shift_noise(frames[-1][0], 1, 1, noise=6, step=4),
            _shift_noise(frames[-1][1], 1, 0),
            _shift_noise(frames[-1][2], 0, 1),
        ))
    payload, recons = encode_mp4_avc1_bgop(
        32, 32, frames, fps=4, qp=21, idr_every=2,
        mv_hints=[(4, 2)] * 9, intra_mbs={(0, 1)},
    )
    st = demux_mp4(payload)
    assert st.comp_offsets is not None
    assert st.display_order == [0, 2, 1, 3, 4, 6, 5, 7, 8]
    assert [i for i in range(9) if is_sync_sample(st, i)] == [0, 4, 8]
    sps, _ = parse_avcc(st.avcc)
    kinds = [
        slice_kind(split_avcc_sample(st.frames[i])[-1], sps)
        for i in range(9)
    ]
    assert kinds == ["I", "P", "B", "P", "I", "P", "B", "P", "I"]
    # the pre-IDR P samples are non-reference
    for i in (3, 7):
        assert (split_avcc_sample(st.frames[i])[-1][0] >> 5) & 3 == 0
    for i in range(9):
        assert decode_mp4_frame(st, i) == _yuv420_to_rgb(*recons[i]), i

    payload, recons = encode_mkv_avc1_bgop(
        32, 32, frames, fps=4, qp=21, idr_every=3, mv_hints=[(4, 2)] * 9,
    )
    st = demux_mkv(payload)
    assert st.store_order is not None
    assert st.timestamps_ms == sorted(st.timestamps_ms)  # display order
    for i in range(9):
        assert decode_mkv_frame(st, i) == _yuv420_to_rgb(*recons[i]), i
