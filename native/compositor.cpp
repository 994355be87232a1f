// Native compositing kernels for the CALipSync-TPU host runtime.
//
// The paste-back hot path (reference
// image_infer_v1/tools/frame_synthesizer/infer_api.py:276-345) runs per
// output frame on the host. The numpy version materializes float32
// temporaries for crop*fm, tgt*(1-fm) and the full-frame copy; this fused
// single-pass version reads each byte once and writes the output frame
// once. Exposed via ctypes (calipsync_tpu/native_ext.py).
//
// Semantics match the reference exactly: float blend, then C-style
// truncation to uint8 (not rounding).

#include <cstdint>
#include <cstring>

extern "C" {

// out_frame := frame (HxWx3 u8) with the region at (y0, x0, rh, rw)
// replaced by crop*fm + frame*(1-fm). fm is (rh*rw) float32 in [0,1].
void composite_frame(const uint8_t* frame, const uint8_t* crop,
                     const float* fm, uint8_t* out_frame,
                     int64_t height, int64_t width,
                     int64_t y0, int64_t x0, int64_t rh, int64_t rw) {
    const int64_t row_bytes = width * 3;
    std::memcpy(out_frame, frame, static_cast<size_t>(height) * row_bytes);
    for (int64_t y = 0; y < rh; ++y) {
        const uint8_t* crop_row = crop + y * rw * 3;
        const float* fm_row = fm + y * rw;
        uint8_t* out_row = out_frame + (y0 + y) * row_bytes + x0 * 3;
        for (int64_t x = 0; x < rw; ++x) {
            const float a = fm_row[x];
            const float b = 1.0f - a;
            const uint8_t* c = crop_row + x * 3;
            uint8_t* o = out_row + x * 3;
            o[0] = static_cast<uint8_t>(c[0] * a + o[0] * b);
            o[1] = static_cast<uint8_t>(c[1] * a + o[1] * b);
            o[2] = static_cast<uint8_t>(c[2] * a + o[2] * b);
        }
    }
}

// Paste a (ph x pw x 3) u8 patch into a (h x w x 3) u8 canvas at (y0, x0),
// writing into a copy (canvas itself is untouched).
void paste_patch(const uint8_t* canvas, const uint8_t* patch,
                 uint8_t* out, int64_t h, int64_t w,
                 int64_t y0, int64_t x0, int64_t ph, int64_t pw) {
    std::memcpy(out, canvas, static_cast<size_t>(h) * w * 3);
    for (int64_t y = 0; y < ph; ++y) {
        std::memcpy(out + ((y0 + y) * w + x0) * 3, patch + y * pw * 3,
                    static_cast<size_t>(pw) * 3);
    }
}

}  // extern "C"
