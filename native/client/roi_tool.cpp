// roi_tool — offline driver for the client's ROI crop pipeline, used by
// the Python parity test (tests/test_native_client.py) to check the C++
// crop/resize/bb math against airpose_tpu/data/pipeline.py on the same
// inputs, without a server in the loop.
//
// Usage: roi_tool W H px py groundtruth context_size \
//            [fx_s fy_s cx_s cy_s fx_d fy_d cx_d cy_d dst_w dst_h]
//   stdin : 4 float32 LE {ymin, ymax, xcenter, ycenter} + img_h*img_w*3 RGB
//   stdout: 3 float32 LE bb + 224*224*3 uint8 crop
// With the 10 extra args the reprojecting path runs instead (the README
// client's `reproject` option): the frame/ROI are in source intrinsics,
// the crop/bb in target intrinsics; px/py are then ignored (the target
// principal point conditions bb).

#include <cstdio>
#include <cstdlib>
#include <vector>

#include "airpose_roi.hpp"

int main(int argc, char** argv) {
  if (argc != 7 && argc != 17) {
    std::fprintf(stderr,
                 "usage: roi_tool W H px py groundtruth context_size "
                 "[fx_s fy_s cx_s cy_s fx_d fy_d cx_d cy_d dst_w dst_h]\n");
    return 2;
  }
  const int w = std::atoi(argv[1]);
  const int h = std::atoi(argv[2]);
  const float px = std::atof(argv[3]);
  const float py = std::atof(argv[4]);
  const bool gt = std::atoi(argv[5]) != 0;
  const int ctx = std::atoi(argv[6]);

  float roi_raw[4];
  std::vector<uint8_t> frame(size_t(h) * w * 3);
  if (std::fread(roi_raw, 4, 4, stdin) != 4 ||
      std::fread(frame.data(), 1, frame.size(), stdin) != frame.size()) {
    std::fprintf(stderr, "roi_tool: truncated stdin\n");
    return 1;
  }

  airpose::RoiMessage roi{roi_raw[0], roi_raw[1], roi_raw[2], roi_raw[3]};
  airpose::CropResult res;
  if (argc == 17) {
    const airpose::Intrinsics src{
        static_cast<float>(std::atof(argv[7])),
        static_cast<float>(std::atof(argv[8])),
        static_cast<float>(std::atof(argv[9])),
        static_cast<float>(std::atof(argv[10]))};
    const airpose::Intrinsics dst{
        static_cast<float>(std::atof(argv[11])),
        static_cast<float>(std::atof(argv[12])),
        static_cast<float>(std::atof(argv[13])),
        static_cast<float>(std::atof(argv[14]))};
    const int dst_w = std::atoi(argv[15]);
    const int dst_h = std::atoi(argv[16]);
    airpose::Box box =
        airpose::roi_to_box_reprojected(roi, src, dst, dst_w, dst_h, gt);
    res = airpose::crop_and_encode_reprojected(frame.data(), w, h, box, src,
                                               dst, 224, ctx);
  } else {
    airpose::Box box = airpose::roi_to_box(roi, w, h, gt);
    res = airpose::crop_and_encode(frame.data(), w, h, box, px, py, 224, ctx);
  }

  std::fwrite(res.bb, 4, 3, stdout);
  std::fwrite(res.rgb.data(), 1, res.rgb.size(), stdout);
  return 0;
}
