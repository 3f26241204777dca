// ROI → crop → bb-encoding pipeline for the native AirPose client.
//
// Re-implements the drone-side image preparation of the reference's aircap
// airpose_client ROS node (missing submodule; behavior from the README's
// ROI-message description — /root/reference/README.md "The ROI message can
// be either used..." block; SURVEY.md §2.9):
//
//   * "groundtruth" mode: the four ROI fields carry a full box with the
//     reference's documented field abuse {ymin=ymin, ymax=ymax,
//     ycenter=xmin, xcenter=xmax};
//   * general mode: {ymin, ymax, xcenter, ycenter} describe a box of
//     height ymax-ymin centered at (xcenter, ycenter) with a 3:4
//     width:height aspect ratio.
//
// The crop/resize/bb math replicates airpose_tpu/data/pipeline.py
// (finish_batch with deterministic margin-0 boxes — the real eval path)
// bit-for-bit in its sampling semantics so that frames served through this
// client match the offline eval pipeline on the same capture:
//
//   1. clamp the box to the frame (data/real.py:203-206 convention:
//      integer bounds);
//   2. if the box exceeds the context budget S (default 672), point-sample
//      decimate by the integer factor f = ceil(max(w,h)/S)
//      (data/real.py:218-224);
//   3. aspect-preserving resize to 224 with centered zero padding using
//      jax.image.scale_and_translate(method="linear", antialias=False)
//      semantics: per-axis triangle kernel on the ZERO-PADDED context
//      buffer (pixels past the decimated extent read 0, not edge-clamped),
//      weights renormalized where the kernel footprint leaves the buffer
//      (data/pipeline.py:55-93 incl. the border mask);
//   4. bb = (crop_center / principal_point − 1, 224/max(w,h) in frame
//      pixels) (data/pipeline.py:130-138; ref dsets/aerialpeople.py:134-135).
//
// The reference client's `reproject` launch option ("reprojection to
// different intrinsics parameters", /root/reference/README.md
// one_robot.launch description; the aircap client source itself is a
// missing submodule) is implemented as a pure-intrinsics reprojection:
// the frame is resampled from the camera's native pinhole intrinsics
// K_src to the canonical intrinsics K_dst the network was trained with
// (an axis-aligned affine — per-axis scale fx_dst/fx_src plus a
// principal-point shift; no rotation, no distortion), the ROI box is
// mapped through the same affine, and the bb conditioning uses the
// TARGET principal point. The resample is folded into the decimation
// stage (one bilinear pass, no intermediate full-frame buffer).

#pragma once

#include <algorithm>
#include <cmath>
#include <cstdint>
#include <vector>

namespace airpose {

struct RoiMessage {
  float ymin, ymax, xcenter, ycenter;
};

struct Box {
  int xmin, ymin, xmax, ymax;  // half-open [min, max) in frame pixels
  int width() const { return xmax - xmin; }
  int height() const { return ymax - ymin; }
};

// Pinhole intrinsics (zero skew/distortion — the README's reprojection
// is between ideal pinhole parameter sets).
struct Intrinsics {
  float fx, fy, cx, cy;
};

namespace detail {

// README ROI semantics → a float box in the ROI's own pixel frame.
inline void roi_to_float_box(const RoiMessage& roi, bool groundtruth,
                             float& x0, float& x1, float& y0, float& y1) {
  if (groundtruth) {
    // field abuse per README: ycenter carries xmin, xcenter carries xmax
    x0 = roi.ycenter;
    x1 = roi.xcenter;
    y0 = roi.ymin;
    y1 = roi.ymax;
  } else {
    // README: "you specify the center and the height of the box" —
    // ymin/ymax carry only the HEIGHT; placement comes from the center
    // (xcenter, ycenter). 3:4 width:height aspect.
    const float h = roi.ymax - roi.ymin;
    const float w = 0.75f * h;
    x0 = roi.xcenter - w / 2.0f;
    x1 = roi.xcenter + w / 2.0f;
    y0 = roi.ycenter - h / 2.0f;
    y1 = roi.ycenter + h / 2.0f;
  }
}

// Truncate + clamp a float box to frame pixels (data/real.py:203-206
// convention: integer bounds), keeping at least one pixel so downstream
// stays finite on degenerate ROIs.
inline Box clamp_box(float x0, float x1, float y0, float y1, int frame_w,
                     int frame_h) {
  Box b;
  b.xmin = std::max(static_cast<int>(x0), 0);
  b.ymin = std::max(static_cast<int>(y0), 0);
  b.xmax = std::min(static_cast<int>(x1), frame_w);
  b.ymax = std::min(static_cast<int>(y1), frame_h);
  if (b.xmax <= b.xmin) b.xmax = std::min(b.xmin + 1, frame_w);
  if (b.ymax <= b.ymin) b.ymax = std::min(b.ymin + 1, frame_h);
  if (b.xmax <= b.xmin) b.xmin = b.xmax - 1;
  if (b.ymax <= b.ymin) b.ymin = b.ymax - 1;
  return b;
}

}  // namespace detail

// README ROI semantics → a pixel box, clamped to the frame.
inline Box roi_to_box(const RoiMessage& roi, int frame_w, int frame_h,
                      bool groundtruth) {
  float x0, x1, y0, y1;
  detail::roi_to_float_box(roi, groundtruth, x0, x1, y0, y1);
  return detail::clamp_box(x0, x1, y0, y1, frame_w, frame_h);
}

// Reprojecting variant: the ROI arrives in SOURCE-camera pixels (the
// detector runs on the camera image); map the float box edges through
// the src→dst intrinsic affine x' = (x − cx_s)·fx_d/fx_s + cx_d before
// truncation/clamping against the TARGET frame dims.
inline Box roi_to_box_reprojected(const RoiMessage& roi,
                                  const Intrinsics& src,
                                  const Intrinsics& dst, int dst_w,
                                  int dst_h, bool groundtruth) {
  float x0, x1, y0, y1;
  detail::roi_to_float_box(roi, groundtruth, x0, x1, y0, y1);
  const float sx = dst.fx / src.fx, sy = dst.fy / src.fy;
  x0 = (x0 - src.cx) * sx + dst.cx;
  x1 = (x1 - src.cx) * sx + dst.cx;
  y0 = (y0 - src.cy) * sy + dst.cy;
  y1 = (y1 - src.cy) * sy + dst.cy;
  return detail::clamp_box(x0, x1, y0, y1, dst_w, dst_h);
}

struct CropResult {
  std::vector<uint8_t> rgb;  // out_size x out_size x 3
  float bb[3];               // (cx/px - 1, cy/py - 1, scale)
};

namespace detail {

// One output scanline's sampling plan for one axis: the two source taps
// and weights of jax.image.scale_and_translate(linear, antialias=False)
// over the S-sized context buffer. jax's compute_weight_mat semantics:
// taps OUTSIDE the buffer [0, S) are excluded and the surviving weights
// renormalize to sum 1; taps inside the buffer but past the decimated
// extent read the buffer's zero padding with their weight kept. The
// distinction matters at the right edge when the decimated box length
// lands within one pixel of S (then a tap falls at index == S and the
// other weight renormalizes to 1 — dropping it unrenormalized diverges
// from finish_batch by tens of uint8 steps).
struct Tap {
  int i0, i1;        // source indices (-1 = contributes zero)
  float w0, w1;
  bool masked;       // outside the content mask (pipeline.py:86-89)
};

inline Tap axis_tap(int o, float scale, float translate, float box_len,
                    int extent, int buffer) {
  Tap t{};
  const float sample = (static_cast<float>(o) + 0.5f - translate) / scale - 0.5f;
  // content mask: o in [translate - 0.5, translate + scale*box_len - 0.5)
  const float oo = static_cast<float>(o);
  t.masked = !(oo >= translate - 0.5f && oo < translate + scale * box_len - 0.5f);
  const int i0 = static_cast<int>(std::floor(sample));
  const float a = sample - static_cast<float>(i0);
  float w0 = 1.0f - a, w1 = a;
  int s0 = i0, s1 = i0 + 1;
  const bool in0 = s0 >= 0 && s0 < buffer;
  const bool in1 = s1 >= 0 && s1 < buffer;
  if (!in0) w0 = 0.0f;
  if (!in1) w1 = 0.0f;
  const float total = w0 + w1;
  if (total > 0.0f) {  // jax divides by the in-buffer weight sum
    w0 /= total;
    w1 /= total;
  }
  // excluded taps, and in-buffer taps past the decimated extent (which
  // read the zero padding), both contribute zero values
  if (!in0 || s0 >= extent) s0 = -1;
  if (!in1 || s1 >= extent) s1 = -1;
  t.i0 = s0;
  t.i1 = s1;
  t.w0 = w0;
  t.w1 = w1;
  return t;
}

}  // namespace detail

namespace detail {

// Shared crop core: `sample(x, y, rgb)` yields the (virtual) frame's
// uint8 pixel at integer frame coords — a direct read for the plain
// path, a bilinear intrinsic remap for the reprojected path. Decimation
// is point sampling at the box's dst-grid pixels either way, so the two
// paths share everything from the context buffer on. (px, py) is the
// principal point of the frame the box lives in.
template <typename Sampler>
inline CropResult crop_and_encode_impl(Sampler&& sample, const Box& box,
                                       float px, float py, int out_size,
                                       int context_size) {
  const int w = box.width(), h = box.height();
  // integer decimation factor (data/real.py:218: ceil(max(w,h)/S))
  const int f = std::max((std::max(w, h) + context_size - 1) / context_size, 1);
  const int w_dec = (w + f - 1) / f;  // crop[::f] length
  const int h_dec = (h + f - 1) / f;

  // decimated crop (point sampling, matching numpy crop[::f, ::f])
  std::vector<uint8_t> dec(static_cast<size_t>(w_dec) * h_dec * 3);
  for (int y = 0; y < h_dec; ++y) {
    const int sy = box.ymin + y * f;
    for (int x = 0; x < w_dec; ++x) {
      const int sx = box.xmin + x * f;
      sample(sx, sy, &dec[(static_cast<size_t>(y) * w_dec + x) * 3]);
    }
  }

  // resize box = (0, 0, w/f, h/f) in decimated coords (float, NOT the
  // ceil'd buffer extent — data/real.py:223 divides person_box by f)
  const float bw = static_cast<float>(w) / static_cast<float>(f);
  const float bh = static_cast<float>(h) / static_cast<float>(f);
  const float scale_ctx =
      static_cast<float>(out_size) / std::max(bw, bh);
  const float ty = (static_cast<float>(out_size) - scale_ctx * bh) / 2.0f;
  const float tx = (static_cast<float>(out_size) - scale_ctx * bw) / 2.0f;

  std::vector<detail::Tap> ytap(out_size), xtap(out_size);
  for (int o = 0; o < out_size; ++o) {
    ytap[o] = detail::axis_tap(o, scale_ctx, ty, bh, h_dec, context_size);
    xtap[o] = detail::axis_tap(o, scale_ctx, tx, bw, w_dec, context_size);
  }

  CropResult res;
  res.rgb.assign(static_cast<size_t>(out_size) * out_size * 3, 0);
  auto at = [&](int y, int x, int c) -> float {
    if (y < 0 || x < 0) return 0.0f;
    return static_cast<float>(
               dec[(static_cast<size_t>(y) * w_dec + x) * 3 + c]) /
           255.0f;
  };
  for (int oy = 0; oy < out_size; ++oy) {
    const detail::Tap& yt = ytap[oy];
    if (yt.masked) continue;
    for (int ox = 0; ox < out_size; ++ox) {
      const detail::Tap& xt = xtap[ox];
      if (xt.masked) continue;
      for (int c = 0; c < 3; ++c) {
        const float v = yt.w0 * (xt.w0 * at(yt.i0, xt.i0, c) +
                                 xt.w1 * at(yt.i0, xt.i1, c)) +
                        yt.w1 * (xt.w0 * at(yt.i1, xt.i0, c) +
                                 xt.w1 * at(yt.i1, xt.i1, c));
        const float u8 = std::min(std::max(v * 255.0f, 0.0f), 255.0f);
        res.rgb[(static_cast<size_t>(oy) * out_size + ox) * 3 + c] =
            static_cast<uint8_t>(u8);  // truncation, as np .astype(uint8)
      }
    }
  }

  // bb in FRAME pixels: center of the un-decimated box; scale folds the
  // decimation factor back in (pipeline.py:313,318-319)
  const float cx = static_cast<float>(box.xmin) + static_cast<float>(w) / 2.0f;
  const float cy = static_cast<float>(box.ymin) + static_cast<float>(h) / 2.0f;
  res.bb[0] = cx / px - 1.0f;
  res.bb[1] = cy / py - 1.0f;
  res.bb[2] = scale_ctx / static_cast<float>(f);
  return res;
}

}  // namespace detail

// Crop `box` out of the full frame, decimate into the context budget,
// resize-with-pad to out_size, and compute the bb conditioning.
// `frame` is H x W x 3 RGB; (px, py) is the camera principal point.
inline CropResult crop_and_encode(const uint8_t* frame, int frame_w,
                                  int frame_h, const Box& box, float px,
                                  float py, int out_size = 224,
                                  int context_size = 672) {
  (void)frame_h;
  auto sample = [&](int x, int y, uint8_t* rgb) {
    const size_t src = (static_cast<size_t>(y) * frame_w + x) * 3;
    rgb[0] = frame[src + 0];
    rgb[1] = frame[src + 1];
    rgb[2] = frame[src + 2];
  };
  return detail::crop_and_encode_impl(sample, box, px, py, out_size,
                                      context_size);
}

// Reprojecting variant (the README client's `reproject` option): `box`
// is in the TARGET intrinsics' pixel frame (roi_to_box_reprojected);
// each target pixel bilinearly samples the source frame through the
// inverse intrinsic affine, pixels that map outside the source read 0
// (constant black border), and the bb conditioning uses the TARGET
// principal point — the served crop is exactly what a camera with
// intrinsics `dst` would have seen.
inline CropResult crop_and_encode_reprojected(
    const uint8_t* frame, int src_w, int src_h, const Box& box,
    const Intrinsics& src, const Intrinsics& dst, int out_size = 224,
    int context_size = 672) {
  const float sx = src.fx / dst.fx, sy = src.fy / dst.fy;
  auto sample = [&](int x, int y, uint8_t* rgb) {
    // pixel centers: dst index x covers continuous coord x + 0.5
    const float us = (static_cast<float>(x) + 0.5f - dst.cx) * sx +
                     src.cx - 0.5f;
    const float vs = (static_cast<float>(y) + 0.5f - dst.cy) * sy +
                     src.cy - 0.5f;
    const int x0 = static_cast<int>(std::floor(us));
    const int y0 = static_cast<int>(std::floor(vs));
    const float ax = us - static_cast<float>(x0);
    const float ay = vs - static_cast<float>(y0);
    auto at = [&](int yy, int xx, int c) -> float {
      if (xx < 0 || yy < 0 || xx >= src_w || yy >= src_h) return 0.0f;
      return static_cast<float>(
          frame[(static_cast<size_t>(yy) * src_w + xx) * 3 + c]);
    };
    for (int c = 0; c < 3; ++c) {
      const float v = (1.0f - ay) * ((1.0f - ax) * at(y0, x0, c) +
                                     ax * at(y0, x0 + 1, c)) +
                      ay * ((1.0f - ax) * at(y0 + 1, x0, c) +
                            ax * at(y0 + 1, x0 + 1, c));
      rgb[c] = static_cast<uint8_t>(
          std::min(std::max(v, 0.0f), 255.0f));  // truncation, as uint8 cast
    }
  };
  return detail::crop_and_encode_impl(sample, box, dst.cx, dst.cy, out_size,
                                      context_size);
}

}  // namespace airpose
