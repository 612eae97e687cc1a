// tvc_micro — dependency-free int8 MLP inference runtime for MCU deployment.
//
// The reference ships its quantized policy to microcontrollers through the
// TFLite-Micro C++ interpreter (scripts/export_tflm.py:444-545). This is the
// framework's own native runtime for the same job: a ~200-line C++17
// implementation of per-tensor-affine int8 fully-connected inference
// (int32 accumulators, float requantization, tanh output head) that needs no
// flatbuffers, no TFLM, and a few hundred bytes of RAM beyond the weights.
//
// Model format (.tvcq, little-endian):
//   magic  u32 = 0x54564351 ("TVCQ")
//   version u32 = 1
//   num_layers u32
//   input_scale f32, input_zero i32        (activation quantization in)
//   per layer: rows u32, cols u32,
//              weight_scale f32,           (symmetric int8 weights)
//              bias[cols] i32,             (pre-scaled: bias_f / (w_s * in_s))
//              weights[rows*cols] i8       (row-major, input-major)
//              out_scale f32, out_zero i32 (activation quantization out)
// Hidden layers use ReLU; the final layer output is dequantized to float and
// passed through tanh on the host/MCU FPU (2 outputs — negligible cost).
//
// Exposed C ABI (for ctypes and firmware alike):
//   tvc_micro_load(bytes, len)        -> handle
//   tvc_micro_infer(handle, in, out)  -> 0 on success (float in/out)
//   tvc_micro_free(handle)
//   tvc_micro_input_dim / output_dim

#include <cmath>
#include <cstdint>
#include <cstring>
#include <vector>

namespace {

struct Layer {
  uint32_t rows = 0;  // input dim
  uint32_t cols = 0;  // output dim
  float weight_scale = 0.f;
  std::vector<int32_t> bias;
  std::vector<int8_t> weights;  // row-major [rows][cols]
  float out_scale = 0.f;
  int32_t out_zero = 0;
};

struct Model {
  float input_scale = 0.f;
  int32_t input_zero = 0;
  std::vector<Layer> layers;
};

class Reader {
 public:
  Reader(const uint8_t* data, size_t len) : data_(data), len_(len) {}
  template <typename T>
  bool read(T* out, size_t count = 1) {
    size_t bytes = sizeof(T) * count;
    if (pos_ + bytes > len_) return false;
    std::memcpy(out, data_ + pos_, bytes);
    pos_ += bytes;
    return true;
  }

 private:
  const uint8_t* data_;
  size_t len_;
  size_t pos_ = 0;
};

constexpr uint32_t kMagic = 0x54564351;  // "TVCQ"

int8_t quantize(float v, float scale, int32_t zero) {
  float q = v / scale + static_cast<float>(zero);
  q = q < -128.f ? -128.f : (q > 127.f ? 127.f : q);
  return static_cast<int8_t>(q >= 0 ? q + 0.5f : q - 0.5f);
}

}  // namespace

extern "C" {

void* tvc_micro_load(const uint8_t* data, uint64_t len) {
  Reader r(data, static_cast<size_t>(len));
  uint32_t magic = 0, version = 0, num_layers = 0;
  if (!r.read(&magic) || magic != kMagic) return nullptr;
  if (!r.read(&version) || version != 1) return nullptr;
  if (!r.read(&num_layers) || num_layers == 0 || num_layers > 16) return nullptr;

  auto model = new Model();
  if (!r.read(&model->input_scale) || !r.read(&model->input_zero)) {
    delete model;
    return nullptr;
  }
  model->layers.resize(num_layers);
  for (auto& layer : model->layers) {
    if (!r.read(&layer.rows) || !r.read(&layer.cols) ||
        layer.rows == 0 || layer.cols == 0 ||
        layer.rows > 4096 || layer.cols > 4096 ||
        !r.read(&layer.weight_scale)) {
      delete model;
      return nullptr;
    }
    layer.bias.resize(layer.cols);
    layer.weights.resize(static_cast<size_t>(layer.rows) * layer.cols);
    if (!r.read(layer.bias.data(), layer.cols) ||
        !r.read(layer.weights.data(), layer.weights.size()) ||
        !r.read(&layer.out_scale) || !r.read(&layer.out_zero)) {
      delete model;
      return nullptr;
    }
  }
  return model;
}

uint32_t tvc_micro_input_dim(const void* handle) {
  auto* m = static_cast<const Model*>(handle);
  return m && !m->layers.empty() ? m->layers.front().rows : 0;
}

uint32_t tvc_micro_output_dim(const void* handle) {
  auto* m = static_cast<const Model*>(handle);
  return m && !m->layers.empty() ? m->layers.back().cols : 0;
}

// float observation in, float tanh(action) out.
int tvc_micro_infer(const void* handle, const float* input, float* output) {
  auto* m = static_cast<const Model*>(handle);
  if (!m || m->layers.empty()) return -1;

  // quantize the observation with the input activation params
  std::vector<int8_t> act(m->layers.front().rows);
  float in_scale = m->input_scale;
  int32_t in_zero = m->input_zero;
  for (uint32_t i = 0; i < m->layers.front().rows; ++i) {
    act[i] = quantize(input[i], in_scale, in_zero);
  }

  std::vector<int8_t> next;
  for (size_t li = 0; li < m->layers.size(); ++li) {
    const Layer& layer = m->layers[li];
    const bool last = li + 1 == m->layers.size();
    // effective rescale from int32 accumulator to the next activation grid:
    // acc * (w_scale * in_scale) = real value
    const float acc_scale = layer.weight_scale * in_scale;
    next.assign(layer.cols, 0);
    for (uint32_t c = 0; c < layer.cols; ++c) {
      int32_t acc = layer.bias[c];
      const int8_t* w = layer.weights.data() + c;
      for (uint32_t rr = 0; rr < layer.rows; ++rr) {
        acc += (static_cast<int32_t>(act[rr]) - in_zero) *
               static_cast<int32_t>(w[static_cast<size_t>(rr) * layer.cols]);
      }
      float real = static_cast<float>(acc) * acc_scale;
      if (last) {
        output[c] = std::tanh(real);
      } else {
        if (real < 0.f) real = 0.f;  // ReLU
        next[c] = quantize(real, layer.out_scale, layer.out_zero);
      }
    }
    if (!last) {
      act = next;
      in_scale = layer.out_scale;
      in_zero = layer.out_zero;
    }
  }
  return 0;
}

void tvc_micro_free(void* handle) { delete static_cast<Model*>(handle); }

}  // extern "C"
