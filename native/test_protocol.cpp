// Unit test: framing + step/image codec round trips (no network).
#include <cassert>
#include <cstdio>
#include <cstring>
#include <vector>

#include "protocol/airpose_protocol.hpp"

int main() {
  using namespace airpose;
  // step payload round trip
  std::vector<uint8_t> payload;
  put_u32(payload, 42u);
  for (int i = 0; i < kNumWireFloats; ++i) put_f32(payload, 0.5f * i);
  StepData s = decode_step(payload);
  assert(s.frame_id == 42u);
  assert(s.betas()[3] == 1.5f);
  float trans[3];
  s.translation(trans);
  assert(trans[0] == (0.5f * 10) / kTransScale);
  assert(s.pose6d()[0] == 0.5f * 13);

  // image frame structure
  std::vector<uint8_t> rgb(4 * 4 * 3, 7);
  float bb[3] = {0.1f, 0.2f, 1.5f};
  float it[3] = {0.f, 0.f, 10.f};
  auto msg = encode_image(1, 9, bb, it, 4, 4, rgb.data());
  assert(get_u32(msg.data()) == kMagic);
  assert(msg[4] == kImage);
  assert(get_u32(msg.data() + 5) == msg.size() - 9);
  assert(get_u32(msg.data() + 9) == 1u);   // robot id
  assert(get_u32(msg.data() + 13) == 9u);  // frame id
  assert(get_f32(msg.data() + 17) == 0.1f);

  std::printf("protocol tests OK\n");
  return 0;
}
