// airpose_client — drone-side TCP client for the AirPose inference server.
//
// Native replacement for the reference's aircap airpose_client ROS node
// (missing submodule; README: crops the person via the NeuralNetworkFeedback
// ROI, streams to the per-drone server, republishes step results). This
// standalone build has a deterministic fake-image mode so the two-drone
// 3-round synchronization is testable without ROS or cameras (the
// reference's own demo replays rosbags on localhost) and can be wired to a
// real image source via stdin raw-RGB mode.
//
// Usage:
//   airpose_client --host 127.0.0.1 --port 9901 --robot-id 1 \
//       --frames 8 --fps 4 [--mode fake|stdin|roi] [--size 224]
//
// Modes:
//   fake   deterministic synthetic 224x224 crops (protocol testing)
//   stdin  pre-cropped raw RGB crops of --size on stdin
//   roi    FULL frames + per-frame ROI on stdin — the reference client's
//          actual role (README one_robot.launch: subscribe image +
//          NeuralNetworkFeedback ROI, crop, stream). Per frame stdin
//          carries 4 float32 LE {ymin, ymax, xcenter, ycenter} followed
//          by --img-h * --img-w * 3 bytes RGB; the client derives the
//          box (--roi-groundtruth flips the README's groundtruth field
//          mapping), crops/resizes exactly like the offline eval
//          pipeline, and computes the bb conditioning from
//          --px/--py (camera principal point). See airpose_roi.hpp.
//          With --reproject (the reference one_robot.launch option),
//          frames are first resampled from the camera's native
//          intrinsics (--src-fx/--src-fy/--px/--py) to the canonical
//          intrinsics the model was trained with
//          (--dst-fx/--dst-fy/--dst-px/--dst-py/--dst-w/--dst-h); the
//          ROI is mapped through the same affine and bb uses the target
//          principal point.
//
// Output: one line per frame
//   RESULT frame=<id> latency_ms=<t> beta0=<v> trans=<x,y,z> pose0=<6 floats>

#include <chrono>
#include <cstdio>
#include <cstdlib>
#include <cstring>
#include <string>
#include <thread>
#include <vector>

#include "../protocol/airpose_protocol.hpp"
#include "airpose_roi.hpp"

namespace {

struct Options {
  std::string host = "127.0.0.1";
  int port = 9901;
  uint32_t robot_id = 1;
  int frames = 4;
  double fps = 4.0;
  int size = 224;
  std::string mode = "fake";
  int img_w = 1920;
  int img_h = 1080;
  float px = 960.0f;   // principal point (constants CX/CY defaults)
  float py = 540.0f;
  bool px_set = false, py_set = false;
  bool roi_groundtruth = false;
  // --reproject (roi mode): resample frames from the camera's native
  // intrinsics (--src-fx/--src-fy + --px/--py) to the canonical
  // intrinsics the model was trained with (the reference one_robot.launch
  // `reproject` option). Target defaults: same focals (identity unless
  // overridden), frame-sized target, centered principal point.
  bool reproject = false;
  float src_fx = 0.0f, src_fy = 0.0f;        // required with --reproject
  float dst_fx = -1.0f, dst_fy = -1.0f;      // default: src focals
  float dst_px = -1.0f, dst_py = -1.0f;      // default: dst frame center
  int dst_w = -1, dst_h = -1;                // default: img_w/img_h
  int context_size = 672;
  std::string dump_results;  // binary {u32 frame_id, f32 data[145]} records
};

Options parse(int argc, char** argv) {
  Options o;
  for (int i = 1; i < argc; ++i) {
    std::string a = argv[i];
    auto next = [&]() -> std::string {
      if (i + 1 >= argc) {
        std::fprintf(stderr, "missing value for %s\n", a.c_str());
        std::exit(2);
      }
      return argv[++i];
    };
    if (a == "--host") o.host = next();
    else if (a == "--port") o.port = std::atoi(next().c_str());
    else if (a == "--robot-id") o.robot_id = std::atoi(next().c_str());
    else if (a == "--frames") o.frames = std::atoi(next().c_str());
    else if (a == "--fps") o.fps = std::atof(next().c_str());
    else if (a == "--size") o.size = std::atoi(next().c_str());
    else if (a == "--mode") o.mode = next();
    else if (a == "--img-w") o.img_w = std::atoi(next().c_str());
    else if (a == "--img-h") o.img_h = std::atoi(next().c_str());
    else if (a == "--px") { o.px = std::atof(next().c_str()); o.px_set = true; }
    else if (a == "--py") { o.py = std::atof(next().c_str()); o.py_set = true; }
    else if (a == "--roi-groundtruth") o.roi_groundtruth = true;
    else if (a == "--reproject") o.reproject = true;
    else if (a == "--src-fx") o.src_fx = std::atof(next().c_str());
    else if (a == "--src-fy") o.src_fy = std::atof(next().c_str());
    else if (a == "--dst-fx") o.dst_fx = std::atof(next().c_str());
    else if (a == "--dst-fy") o.dst_fy = std::atof(next().c_str());
    else if (a == "--dst-px") o.dst_px = std::atof(next().c_str());
    else if (a == "--dst-py") o.dst_py = std::atof(next().c_str());
    else if (a == "--dst-w") o.dst_w = std::atoi(next().c_str());
    else if (a == "--dst-h") o.dst_h = std::atoi(next().c_str());
    else if (a == "--context-size") o.context_size = std::atoi(next().c_str());
    else if (a == "--dump-results") o.dump_results = next();
    else {
      std::fprintf(stderr, "unknown arg %s\n", a.c_str());
      std::exit(2);
    }
  }
  if (o.reproject) {
    if (o.mode != "roi") {
      std::fprintf(stderr, "--reproject needs --mode roi\n");
      std::exit(2);
    }
    if (o.src_fx <= 0.0f || o.src_fy <= 0.0f) {
      std::fprintf(stderr, "--reproject needs --src-fx/--src-fy > 0\n");
      std::exit(2);
    }
    if (!o.px_set || !o.py_set) {
      // the 1080p default principal point would silently shift the whole
      // resample on any other frame size — demand the full source K
      std::fprintf(stderr,
                   "--reproject needs the source principal point --px/--py\n");
      std::exit(2);
    }
    if (o.dst_w <= 0) o.dst_w = o.img_w;
    if (o.dst_h <= 0) o.dst_h = o.img_h;
    if (o.dst_fx <= 0.0f) o.dst_fx = o.src_fx;
    if (o.dst_fy <= 0.0f) o.dst_fy = o.src_fy;
    if (o.dst_px < 0.0f) o.dst_px = static_cast<float>(o.dst_w) / 2.0f;
    if (o.dst_py < 0.0f) o.dst_py = static_cast<float>(o.dst_h) / 2.0f;
  }
  return o;
}

// Deterministic synthetic frame: robot/frame-seeded gradient + blob.
void fake_frame(uint32_t robot_id, uint32_t frame_id, int size,
                std::vector<uint8_t>& rgb) {
  rgb.resize(size_t(size) * size * 3);
  const int cx = (17 * (frame_id + 3 * robot_id)) % size;
  const int cy = (29 * (frame_id + 5 * robot_id)) % size;
  for (int y = 0; y < size; ++y) {
    for (int x = 0; x < size; ++x) {
      size_t i = (size_t(y) * size + x) * 3;
      int dx = x - cx, dy = y - cy;
      int blob = 255 - std::min(255, (dx * dx + dy * dy) / 8);
      rgb[i + 0] = static_cast<uint8_t>((x * 255) / size);
      rgb[i + 1] = static_cast<uint8_t>((y * 255) / size);
      rgb[i + 2] = static_cast<uint8_t>(blob);
    }
  }
}

}  // namespace

int main(int argc, char** argv) {
  Options o = parse(argc, argv);
  try {
    airpose::Connection conn(o.host, o.port);
    FILE* dump = nullptr;
    if (!o.dump_results.empty()) {
      dump = std::fopen(o.dump_results.c_str(), "wb");
      if (!dump) {
        std::fprintf(stderr, "cannot open %s\n", o.dump_results.c_str());
        return 1;
      }
    }
    std::vector<uint8_t> rgb;
    std::vector<uint8_t> full;  // roi mode: full-resolution frame
    float bb[3] = {0.0f, 0.0f, 1.0f};
    const float init_trans[3] = {0.0f, 0.0f, 10.0f};
    const auto period =
        std::chrono::duration<double>(o.fps > 0 ? 1.0 / o.fps : 0.0);

    for (int f = 0; f < o.frames; ++f) {
      if (o.mode == "stdin") {
        rgb.resize(size_t(o.size) * o.size * 3);
        if (std::fread(rgb.data(), 1, rgb.size(), stdin) != rgb.size()) {
          std::fprintf(stderr, "stdin frame %d truncated\n", f);
          return 1;
        }
      } else if (o.mode == "roi") {
        float roi_raw[4];
        full.resize(size_t(o.img_h) * o.img_w * 3);
        if (std::fread(roi_raw, 4, 4, stdin) != 4 ||
            std::fread(full.data(), 1, full.size(), stdin) != full.size()) {
          std::fprintf(stderr, "stdin roi frame %d truncated\n", f);
          return 1;
        }
        airpose::RoiMessage roi{roi_raw[0], roi_raw[1], roi_raw[2],
                                roi_raw[3]};
        airpose::CropResult crop;
        if (o.reproject) {
          // README one_robot.launch `reproject`: resample to the model's
          // canonical intrinsics before crop/encode (airpose_roi.hpp)
          const airpose::Intrinsics src{o.src_fx, o.src_fy, o.px, o.py};
          const airpose::Intrinsics dst{o.dst_fx, o.dst_fy, o.dst_px,
                                        o.dst_py};
          airpose::Box box = airpose::roi_to_box_reprojected(
              roi, src, dst, o.dst_w, o.dst_h, o.roi_groundtruth);
          crop = airpose::crop_and_encode_reprojected(
              full.data(), o.img_w, o.img_h, box, src, dst, o.size,
              o.context_size);
        } else {
          airpose::Box box = airpose::roi_to_box(roi, o.img_w, o.img_h,
                                                 o.roi_groundtruth);
          crop = airpose::crop_and_encode(full.data(), o.img_w, o.img_h,
                                          box, o.px, o.py, o.size,
                                          o.context_size);
        }
        rgb = std::move(crop.rgb);
        bb[0] = crop.bb[0];
        bb[1] = crop.bb[1];
        bb[2] = crop.bb[2];
      } else {
        fake_frame(o.robot_id, f, o.size, rgb);
      }

      auto t0 = std::chrono::steady_clock::now();
      conn.send(airpose::encode_image(o.robot_id, f, bb, init_trans, o.size,
                                      o.size, rgb.data()));
      airpose::Message msg = conn.recv_message();
      auto t1 = std::chrono::steady_clock::now();
      if (msg.type != airpose::kResult) {
        std::fprintf(stderr, "unexpected message type %d\n", msg.type);
        return 1;
      }
      airpose::StepData step = airpose::decode_step(msg.payload);
      if (dump) {
        std::fwrite(&step.frame_id, 4, 1, dump);
        std::fwrite(step.data, 4, airpose::kNumWireFloats, dump);
      }
      float trans[3];
      step.translation(trans);
      double ms =
          std::chrono::duration<double, std::milli>(t1 - t0).count();
      std::printf(
          "RESULT frame=%u latency_ms=%.1f beta0=%.4f trans=%.3f,%.3f,%.3f "
          "pose0=%.3f,%.3f,%.3f,%.3f,%.3f,%.3f\n",
          step.frame_id, ms, step.betas()[0], trans[0], trans[1], trans[2],
          step.pose6d()[0], step.pose6d()[1], step.pose6d()[2],
          step.pose6d()[3], step.pose6d()[4], step.pose6d()[5]);
      std::fflush(stdout);

      if (f + 1 < o.frames && period.count() > 0) {
        auto elapsed = std::chrono::steady_clock::now() - t0;
        if (elapsed < period)
          std::this_thread::sleep_for(period - elapsed);
      }
    }
    if (dump) std::fclose(dump);
  } catch (const std::exception& e) {
    std::fprintf(stderr, "airpose_client: %s\n", e.what());
    return 1;
  }
  return 0;
}
