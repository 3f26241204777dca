// Unit tests: ROI box semantics + crop/resize/bb invariants (no network).
// Cross-framework numeric parity with the Python eval pipeline is covered
// by tests/test_native_client.py::test_roi_crop_matches_python_pipeline.
#include <cassert>
#include <cmath>
#include <cstdio>
#include <vector>

#include "client/airpose_roi.hpp"

namespace {

bool close(float a, float b, float tol = 1e-5f) {
  return std::fabs(a - b) <= tol;
}

}  // namespace

int main() {
  using namespace airpose;

  // groundtruth mode: README field abuse {ymin, ymax, ycenter=xmin,
  // xcenter=xmax}
  Box g = roi_to_box({100.f, 500.f, 800.f, 300.f}, 1920, 1080, true);
  assert(g.xmin == 300 && g.xmax == 800 && g.ymin == 100 && g.ymax == 500);

  // general mode: ymin/ymax carry only the HEIGHT; placement comes from
  // the (xcenter, ycenter) center (README: "you specify the center and
  // the height of the box"), 3:4 width:height
  Box c = roi_to_box({100.f, 500.f, 600.f, 300.f}, 1920, 1080, false);
  assert(c.ymin == 100 && c.ymax == 500);  // 300 ± 200
  assert(c.height() == 400);
  assert(c.xmin == 450 && c.xmax == 750);  // 600 ± 150 (w = 0.75*400)
  assert(c.width() == 300);
  // ycenter off the ymin/ymax midpoint: the box follows the CENTER
  Box c2 = roi_to_box({100.f, 500.f, 600.f, 350.f}, 1920, 1080, false);
  assert(c2.ymin == 150 && c2.ymax == 550);

  // clamping to the frame
  Box e = roi_to_box({-50.f, 2000.f, 10.f, 500.f}, 1920, 1080, false);
  assert(e.ymin == 0 && e.ymax == 1080);
  assert(e.xmin == 0);

  // degenerate ROI keeps at least one pixel
  Box d = roi_to_box({10.f, 10.f, 5.f, 5.f}, 64, 64, false);
  assert(d.width() >= 1 && d.height() >= 1);

  // crop_and_encode on a constant image: interior of the output equals
  // the constant, the padded border is zero, and bb matches the formula
  const int W = 200, H = 100;
  std::vector<uint8_t> frame(size_t(W) * H * 3, 200);
  Box box{20, 10, 180, 90};  // w=160 h=80 → landscape, pad top/bottom
  CropResult r = crop_and_encode(frame.data(), W, H, box, 100.f, 50.f);
  // scale = 224/160; ty = (224 - scale*80)/2 = 56
  assert(close(r.bb[2], 224.0f / 160.0f));
  assert(close(r.bb[0], (20 + 80.0f) / 100.0f - 1.0f));
  assert(close(r.bb[1], (10 + 40.0f) / 50.0f - 1.0f));
  auto px = [&](int y, int x) { return r.rgb[(size_t(y) * 224 + x) * 3]; };
  assert(px(0, 112) == 0);    // above content (padded)
  assert(px(223, 112) == 0);  // below content
  assert(px(112, 112) == 199 || px(112, 112) == 200);  // interior (f32 round)
  assert(px(56, 112) >= 99);  // first content row (mask boundary)

  // decimation path: a box larger than the context budget still produces
  // a full-range crop and folds f into the bb scale
  const int W2 = 1920, H2 = 1080;
  std::vector<uint8_t> big(size_t(W2) * H2 * 3, 123);
  Box box2{0, 0, 1400, 1000};  // max dim 1400 > 672 → f = 3
  CropResult r2 = crop_and_encode(big.data(), W2, H2, box2, 960.f, 540.f);
  const float f = 3.0f;
  const float scale_ctx = 224.0f / (1400.0f / f);
  assert(close(r2.bb[2], scale_ctx / f));
  assert(r2.rgb[(size_t(112) * 224 + 112) * 3] >= 122);

  // --- reprojection (README one_robot.launch `reproject` option) ---

  // identity intrinsics: the reprojected path must equal the plain path
  // bit-for-bit (the affine is exact on integer pixel centers, so every
  // bilinear weight collapses to 1·pixel)
  {
    const Intrinsics K{800.f, 800.f, 100.f, 50.f};
    RoiMessage roi{10.f, 90.f, 180.f, 20.f};  // gt: x[20,180] y[10,90]
    Box pb = roi_to_box(roi, W, H, true);
    Box rb = roi_to_box_reprojected(roi, K, K, W, H, true);
    assert(pb.xmin == rb.xmin && pb.xmax == rb.xmax && pb.ymin == rb.ymin &&
           pb.ymax == rb.ymax);
    std::vector<uint8_t> img(size_t(W) * H * 3);
    for (size_t i = 0; i < img.size(); ++i)
      img[i] = static_cast<uint8_t>((i * 31) % 251);
    CropResult plain = crop_and_encode(img.data(), W, H, pb, K.cx, K.cy);
    CropResult rep =
        crop_and_encode_reprojected(img.data(), W, H, rb, K, K);
    assert(plain.rgb == rep.rgb);
    for (int i = 0; i < 3; ++i) assert(close(plain.bb[i], rep.bb[i]));
  }

  // focal change: halving the focal halves the box extent around the
  // principal point, and bb conditions on the TARGET principal point
  {
    const Intrinsics src{800.f, 800.f, 100.f, 50.f};
    const Intrinsics dst{400.f, 400.f, 80.f, 40.f};
    RoiMessage roi{10.f, 90.f, 180.f, 20.f};  // src box x[20,180] y[10,90]
    Box rb = roi_to_box_reprojected(roi, src, dst, 160, 80, true);
    // x: (20-100)*0.5+80 = 40, (180-100)*0.5+80 = 120
    // y: (10-50)*0.5+40 = 20, (90-50)*0.5+40 = 60
    assert(rb.xmin == 40 && rb.xmax == 120 && rb.ymin == 20 && rb.ymax == 60);
    std::vector<uint8_t> img(size_t(W) * H * 3, 77);
    CropResult rep =
        crop_and_encode_reprojected(img.data(), W, H, rb, src, dst);
    assert(close(rep.bb[0], 80.0f / dst.cx - 1.0f));
    assert(close(rep.bb[1], 40.0f / dst.cy - 1.0f));
    // constant image stays constant through the bilinear remap (interior)
    assert(rep.rgb[(size_t(112) * 224 + 112) * 3] >= 76);
  }

  std::printf("roi tests OK\n");
  return 0;
}
