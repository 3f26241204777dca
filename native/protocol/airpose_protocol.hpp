// AirPose wire protocol — C++ implementation of airpose_tpu/serve/protocol.py.
//
// Re-implements the drone-side transport of the reference's aircap
// airpose_client (C++ ROS node, missing submodule; behavior from the
// README's client/server + ROI protocol description — SURVEY.md §2.9),
// without the ROS dependency: length-framed messages over TCP.
//
// Wire format (little-endian):
//   [u32 magic=0xA19B0001][u8 type][u32 payload_len][payload]
//   type 1 IMAGE : u32 robot_id | u32 frame_id | f32 bb[3] |
//                  f32 init_trans[3] | u32 h | u32 w | u8 rgb[h*w*3]
//   type 2 STEP1 / 3 STEP2 / 4 RESULT : u32 frame_id | f32 data[145]
//   type 5 HELLO : u32 robot_id
//
// The 145-float parameter message preserves the reference layout:
// data[0:10]=betas, data[10:13]=translation*0.05, data[13:145]=22x6D pose.

#pragma once

#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstdint>
#include <cstring>
#include <stdexcept>
#include <string>
#include <vector>

namespace airpose {

constexpr uint32_t kMagic = 0xA19B0001u;
constexpr int kNumWireFloats = 145;
constexpr float kTransScale = 0.05f;
// Largest legal payload — mirrors protocol.py's MAX_PAYLOAD so a corrupt
// or hostile length prefix (u32 → up to 4 GB) cannot make the drone-side
// client allocate unbounded memory mid-flight.
constexpr uint32_t kMaxPayload = 1u << 26;

enum MsgType : uint8_t {
  kImage = 1,
  kStep1 = 2,
  kStep2 = 3,
  kResult = 4,
  kHello = 5,
};

struct Message {
  uint8_t type;
  std::vector<uint8_t> payload;
};

inline void put_u32(std::vector<uint8_t>& buf, uint32_t v) {
  for (int i = 0; i < 4; ++i) buf.push_back((v >> (8 * i)) & 0xff);
}

inline uint32_t get_u32(const uint8_t* p) {
  return uint32_t(p[0]) | uint32_t(p[1]) << 8 | uint32_t(p[2]) << 16 |
         uint32_t(p[3]) << 24;
}

inline void put_f32(std::vector<uint8_t>& buf, float v) {
  uint32_t bits;
  std::memcpy(&bits, &v, 4);
  put_u32(buf, bits);
}

inline float get_f32(const uint8_t* p) {
  uint32_t bits = get_u32(p);
  float v;
  std::memcpy(&v, &bits, 4);
  return v;
}

inline std::vector<uint8_t> frame(uint8_t type,
                                  const std::vector<uint8_t>& payload) {
  std::vector<uint8_t> out;
  out.reserve(9 + payload.size());
  put_u32(out, kMagic);
  out.push_back(type);
  put_u32(out, static_cast<uint32_t>(payload.size()));
  out.insert(out.end(), payload.begin(), payload.end());
  return out;
}

inline std::vector<uint8_t> encode_hello(uint32_t robot_id) {
  std::vector<uint8_t> payload;
  put_u32(payload, robot_id);
  return frame(kHello, payload);
}

inline std::vector<uint8_t> encode_image(uint32_t robot_id, uint32_t frame_id,
                                         const float bb[3],
                                         const float init_trans[3],
                                         uint32_t h, uint32_t w,
                                         const uint8_t* rgb) {
  std::vector<uint8_t> payload;
  payload.reserve(40 + size_t(h) * w * 3);
  put_u32(payload, robot_id);
  put_u32(payload, frame_id);
  for (int i = 0; i < 3; ++i) put_f32(payload, bb[i]);
  for (int i = 0; i < 3; ++i) put_f32(payload, init_trans[i]);
  put_u32(payload, h);
  put_u32(payload, w);
  payload.insert(payload.end(), rgb, rgb + size_t(h) * w * 3);
  return frame(kImage, payload);
}

struct StepData {
  uint32_t frame_id;
  float data[kNumWireFloats];

  // Reference wire layout accessors.
  const float* betas() const { return data; }
  void translation(float out[3]) const {
    for (int i = 0; i < 3; ++i) out[i] = data[10 + i] / kTransScale;
  }
  const float* pose6d() const { return data + 13; }
};

inline StepData decode_step(const std::vector<uint8_t>& payload) {
  if (payload.size() < 4 + 4 * kNumWireFloats)
    throw std::runtime_error("short step payload");
  StepData s;
  s.frame_id = get_u32(payload.data());
  std::memcpy(s.data, payload.data() + 4, 4 * kNumWireFloats);
  return s;
}

// ---- blocking socket transport ----

class Connection {
 public:
  Connection(const std::string& host, int port) {
    fd_ = ::socket(AF_INET, SOCK_STREAM, 0);
    if (fd_ < 0) throw std::runtime_error("socket() failed");
    sockaddr_in addr{};
    addr.sin_family = AF_INET;
    addr.sin_port = htons(static_cast<uint16_t>(port));
    hostent* he = ::gethostbyname(host.c_str());
    if (!he) throw std::runtime_error("unknown host " + host);
    std::memcpy(&addr.sin_addr, he->h_addr, he->h_length);
    if (::connect(fd_, reinterpret_cast<sockaddr*>(&addr), sizeof(addr)) != 0)
      throw std::runtime_error("connect() to " + host + " failed");
  }
  ~Connection() {
    if (fd_ >= 0) ::close(fd_);
  }
  Connection(const Connection&) = delete;
  Connection& operator=(const Connection&) = delete;

  void send(const std::vector<uint8_t>& bytes) {
    size_t off = 0;
    while (off < bytes.size()) {
      ssize_t n = ::send(fd_, bytes.data() + off, bytes.size() - off, 0);
      if (n <= 0) throw std::runtime_error("send() failed");
      off += static_cast<size_t>(n);
    }
  }

  Message recv_message() {
    uint8_t header[9];
    recv_all(header, 9);
    if (get_u32(header) != kMagic) throw std::runtime_error("bad magic");
    Message msg;
    msg.type = header[4];
    uint32_t len = get_u32(header + 5);
    if (len > kMaxPayload) throw std::runtime_error("payload too large");
    msg.payload.resize(len);
    if (len) recv_all(msg.payload.data(), len);
    return msg;
  }

 private:
  void recv_all(uint8_t* dst, size_t n) {
    size_t off = 0;
    while (off < n) {
      ssize_t got = ::recv(fd_, dst + off, n - off, 0);
      if (got <= 0) throw std::runtime_error("connection closed");
      off += static_cast<size_t>(got);
    }
  }
  int fd_ = -1;
};

}  // namespace airpose
