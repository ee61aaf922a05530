// Native dataset loader: thread-pooled PNG decode + color conversion.
//
// TPU-native equivalent of the reference's native data path
// (internal/dataset/nerf_synthetic.cu:57-127 + thread_pool.h + stb_image):
// decodes all frames on a std::thread pool via libpng and converts RGBA8 ->
// premultiplied-alpha *linear* fp16 (the from_rgba32 kernel's job,
// common_device.h:160-175) on the host, so the device receives the final
// (N, H, W, 4) fp16 tensor in one upload.
//
// Exposed as a plain C ABI for ctypes (no pybind11 in this environment).

#include <atomic>
#include <cmath>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <thread>
#include <vector>

#include <png.h>

namespace {

// ---------------------------------------------------------------- fp16 bits
inline uint16_t float_to_half(float f) {
    uint32_t x;
    std::memcpy(&x, &f, 4);
    uint32_t sign = (x >> 16) & 0x8000u;
    int32_t exp = (int32_t)((x >> 23) & 0xFF) - 127 + 15;
    uint32_t mant = x & 0x7FFFFFu;
    if (exp <= 0) {
        if (exp < -10) return (uint16_t)sign;  // underflow to signed zero
        mant |= 0x800000u;
        uint32_t shift = (uint32_t)(14 - exp);
        uint32_t half_mant = mant >> shift;
        // round-to-nearest-even
        uint32_t rem = mant & ((1u << shift) - 1);
        uint32_t halfway = 1u << (shift - 1);
        if (rem > halfway || (rem == halfway && (half_mant & 1))) half_mant++;
        return (uint16_t)(sign | half_mant);
    }
    if (exp >= 31) return (uint16_t)(sign | 0x7C00u);  // overflow to inf
    uint32_t half = sign | ((uint32_t)exp << 10) | (mant >> 13);
    uint32_t rem = mant & 0x1FFFu;
    if (rem > 0x1000u || (rem == 0x1000u && (half & 1))) half++;
    return (uint16_t)half;
}

// sRGB8 -> linear float LUT (srgb_to_linear, common_device.h:71-73)
struct SrgbLut {
    float v[256];
    SrgbLut() {
        for (int i = 0; i < 256; ++i) {
            float s = (float)i / 255.0f;
            v[i] = s <= 0.04045f ? s / 12.92f : std::pow((s + 0.055f) / 1.055f, 2.4f);
        }
    }
};
const SrgbLut kSrgb;

// ------------------------------------------------------------- PNG decoding
struct Image {
    std::vector<uint8_t> rgba;  // w*h*4
    int w = 0, h = 0;
    bool ok = false;
};

bool decode_png_rgba8(const char* path, Image& out) {
    FILE* fp = std::fopen(path, "rb");
    if (!fp) return false;
    png_byte header[8];
    if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
        std::fclose(fp);
        return false;
    }
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    png_infop info = png ? png_create_info_struct(png) : nullptr;
    if (!png || !info || setjmp(png_jmpbuf(png))) {
        if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
        std::fclose(fp);
        return false;
    }
    png_init_io(png, fp);
    png_set_sig_bytes(png, 8);
    png_read_info(png, info);

    out.w = (int)png_get_image_width(png, info);
    out.h = (int)png_get_image_height(png, info);
    int color = png_get_color_type(png, info);
    int depth = png_get_bit_depth(png, info);

    // normalize every input to 8-bit RGBA
    if (depth == 16) png_set_strip_16(png);
    if (color == PNG_COLOR_TYPE_PALETTE) png_set_palette_to_rgb(png);
    if (color == PNG_COLOR_TYPE_GRAY && depth < 8) png_set_expand_gray_1_2_4_to_8(png);
    if (png_get_valid(png, info, PNG_INFO_tRNS)) png_set_tRNS_to_alpha(png);
    if (color == PNG_COLOR_TYPE_RGB || color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_PALETTE)
        png_set_filler(png, 0xFF, PNG_FILLER_AFTER);
    if (color == PNG_COLOR_TYPE_GRAY || color == PNG_COLOR_TYPE_GRAY_ALPHA) png_set_gray_to_rgb(png);
    png_read_update_info(png, info);

    out.rgba.resize((size_t)out.w * out.h * 4);
    std::vector<png_bytep> rows(out.h);
    for (int y = 0; y < out.h; ++y) rows[y] = out.rgba.data() + (size_t)y * out.w * 4;
    png_read_image(png, rows.data());
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    out.ok = true;
    return true;
}

void convert_to_premult_linear_half(const Image& img, uint16_t* dst) {
    const size_t n = (size_t)img.w * img.h;
    for (size_t i = 0; i < n; ++i) {
        const uint8_t* p = img.rgba.data() + i * 4;
        float a = (float)p[3] * (1.0f / 255.0f);
        dst[i * 4 + 0] = float_to_half(kSrgb.v[p[0]] * a);
        dst[i * 4 + 1] = float_to_half(kSrgb.v[p[1]] * a);
        dst[i * 4 + 2] = float_to_half(kSrgb.v[p[2]] * a);
        dst[i * 4 + 3] = float_to_half(a);
    }
}

}  // namespace

extern "C" {

// Query one image's dimensions. Returns 0 on success.
int ngp_png_size(const char* path, int* w, int* h) {
    Image img;
    FILE* fp = std::fopen(path, "rb");
    if (!fp) return 1;
    png_byte header[8];
    if (std::fread(header, 1, 8, fp) != 8 || png_sig_cmp(header, 0, 8)) {
        std::fclose(fp);
        return 2;
    }
    png_structp png = png_create_read_struct(PNG_LIBPNG_VER_STRING, nullptr, nullptr, nullptr);
    png_infop info = png ? png_create_info_struct(png) : nullptr;
    if (!png || !info || setjmp(png_jmpbuf(png))) {
        if (png) png_destroy_read_struct(&png, info ? &info : nullptr, nullptr);
        std::fclose(fp);
        return 3;
    }
    png_init_io(png, fp);
    png_set_sig_bytes(png, 8);
    png_read_info(png, info);
    *w = (int)png_get_image_width(png, info);
    *h = (int)png_get_image_height(png, info);
    png_destroy_read_struct(&png, &info, nullptr);
    std::fclose(fp);
    return 0;
}

// Decode `n` PNGs (all width x height) into `out` (n*h*w*4 fp16 bits),
// premultiplied-alpha linear. Returns 0 on success, 1-based index of the
// first failing file otherwise.
int ngp_load_images(const char** paths, int n, int width, int height, uint16_t* out, int n_threads) {
    if (n_threads <= 0) n_threads = (int)std::thread::hardware_concurrency();
    std::atomic<int> next{0};
    std::atomic<int> failed{0};
    const size_t stride = (size_t)width * height * 4;

    auto worker = [&]() {
        for (;;) {
            int i = next.fetch_add(1);
            if (i >= n || failed.load()) return;
            Image img;
            if (!decode_png_rgba8(paths[i], img) || img.w != width || img.h != height) {
                int expect = 0;
                failed.compare_exchange_strong(expect, i + 1);
                return;
            }
            convert_to_premult_linear_half(img, out + stride * i);
        }
    };
    std::vector<std::thread> threads;
    int nt = n_threads < n ? n_threads : n;
    for (int t = 0; t < nt; ++t) threads.emplace_back(worker);
    for (auto& t : threads) t.join();
    return failed.load();
}

}  // extern "C"
