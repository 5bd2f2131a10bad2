// Chamfer distance-transform push-out field.
//
// Native implementation of the reference's CPU worker-thread algorithm
// (reference src/main.rs:403-515): a two-pass 8-neighbor chamfer propagation
// of nearest-source coordinates over a grayscale mask, producing for every
// pixel a vector (in pixel units) toward its nearest "outside" (>128) pixel,
// or the image border if nothing is outside. Used as the exact oracle for
// the on-device JFA field (tpufluid/ops/forcefield.py) and as a fast host
// path for video-driven force fields.
//
// Exposed C ABI for ctypes.

#include <cstdint>
#include <cstring>
#include <vector>
#include <limits>
#include <cmath>

extern "C" {

// mask: u8[height*width] row-major; out: f32[height*width*2] (x, y) vectors.
void chamfer_push_field(const uint8_t* mask, int32_t width, int32_t height,
                        float* out) {
    const size_t n = static_cast<size_t>(width) * height;
    std::vector<float> dist(n, std::numeric_limits<float>::max());
    std::vector<int32_t> nearest_x(n, 0), nearest_y(n, 0);

    auto idx = [width](int32_t x, int32_t y) {
        return static_cast<size_t>(y) * width + x;
    };
    auto sq = [](int32_t x1, int32_t y1, int32_t x2, int32_t y2) {
        const float dx = static_cast<float>(x1 - x2);
        const float dy = static_cast<float>(y1 - y2);
        return dx * dx + dy * dy;
    };

    // Step 1: seed with source pixels (>128); border fallback if none.
    bool has_source = false;
    for (int32_t y = 0; y < height; ++y) {
        for (int32_t x = 0; x < width; ++x) {
            if (mask[idx(x, y)] > 128) {
                dist[idx(x, y)] = 0.0f;
                nearest_x[idx(x, y)] = x;
                nearest_y[idx(x, y)] = y;
                has_source = true;
            }
        }
    }
    if (!has_source) {
        for (int32_t y = 0; y < height; ++y) {
            for (int32_t x = 0; x < width; ++x) {
                if (y == 0 || y == height - 1 || x == 0 || x == width - 1) {
                    dist[idx(x, y)] = 0.0f;
                    nearest_x[idx(x, y)] = x;
                    nearest_y[idx(x, y)] = y;
                }
            }
        }
    }

    // Step 2: forward pass — left, top-left, top, top-right.
    const int32_t fwd[4][2] = {{-1, 0}, {-1, -1}, {0, -1}, {1, -1}};
    for (int32_t y = 0; y < height; ++y) {
        for (int32_t x = 0; x < width; ++x) {
            for (const auto& o : fwd) {
                const int32_t nx = x + o[0], ny = y + o[1];
                if (nx < 0 || ny < 0 || nx >= width || ny >= height) continue;
                const size_t ni = idx(nx, ny);
                const float d = sq(x, y, nearest_x[ni], nearest_y[ni]);
                if (d < dist[idx(x, y)]) {
                    dist[idx(x, y)] = d;
                    nearest_x[idx(x, y)] = nearest_x[ni];
                    nearest_y[idx(x, y)] = nearest_y[ni];
                }
            }
        }
    }

    // Step 3: backward pass — right, bottom-right, bottom, bottom-left.
    const int32_t bwd[4][2] = {{1, 0}, {1, 1}, {0, 1}, {-1, 1}};
    for (int32_t y = height - 1; y >= 0; --y) {
        for (int32_t x = width - 1; x >= 0; --x) {
            for (const auto& o : bwd) {
                const int32_t nx = x + o[0], ny = y + o[1];
                if (nx < 0 || ny < 0 || nx >= width || ny >= height) continue;
                const size_t ni = idx(nx, ny);
                const float d = sq(x, y, nearest_x[ni], nearest_y[ni]);
                if (d < dist[idx(x, y)]) {
                    dist[idx(x, y)] = d;
                    nearest_x[idx(x, y)] = nearest_x[ni];
                    nearest_y[idx(x, y)] = nearest_y[ni];
                }
            }
        }
    }

    // Step 4: push vector = source - pixel (zero at sources).
    for (int32_t y = 0; y < height; ++y) {
        for (int32_t x = 0; x < width; ++x) {
            const size_t i = idx(x, y);
            const float dx = static_cast<float>(x - nearest_x[i]);
            const float dy = static_cast<float>(y - nearest_y[i]);
            const float len = std::sqrt(dx * dx + dy * dy);
            if (len > 1e-6f) {
                out[i * 2 + 0] = -dx;
                out[i * 2 + 1] = -dy;
            } else {
                out[i * 2 + 0] = 0.0f;
                out[i * 2 + 1] = 0.0f;
            }
        }
    }
}

}  // extern "C"
