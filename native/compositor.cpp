// Native compositing kernels for the CALipSync-TPU host runtime.
//
// The paste-back hot path (reference
// image_infer_v1/tools/frame_synthesizer/infer_api.py:276-345) runs per
// output frame on the host. The numpy version materializes float32
// temporaries for crop*fm, tgt*(1-fm) and the full-frame copy; this fused
// single-pass version writes every output byte exactly once: background
// rows are memcpy'd, and inside the blend rect the mask — binary {0,1}
// except under an XSeg blend — is consumed as runs, so a==1 spans become
// crop memcpys and a==0 spans become frame memcpys. Exposed via ctypes
// (calipsync_tpu/native_ext.py).
//
// Semantics match the reference exactly: float blend, then C-style
// truncation to uint8 (not rounding). The a==1 / a==0 fast paths are
// exact special cases of that formula (c*1+o*0 -> c, c*0+o*1 -> o).

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
    // rows above and below the rect
    std::memcpy(out_frame, frame, static_cast<size_t>(y0) * row_bytes);
    std::memcpy(out_frame + (y0 + rh) * row_bytes,
                frame + (y0 + rh) * row_bytes,
                static_cast<size_t>(height - y0 - rh) * row_bytes);
    for (int64_t y = 0; y < rh; ++y) {
        const uint8_t* crop_row = crop + y * rw * 3;
        const uint8_t* frame_row = frame + (y0 + y) * row_bytes;
        const float* fm_row = fm + y * rw;
        uint8_t* out_row = out_frame + (y0 + y) * row_bytes;
        // row segments left and right of the rect
        std::memcpy(out_row, frame_row, static_cast<size_t>(x0) * 3);
        std::memcpy(out_row + (x0 + rw) * 3, frame_row + (x0 + rw) * 3,
                    static_cast<size_t>(width - x0 - rw) * 3);
        // inside the rect: run-length select on the (mostly binary) mask
        int64_t x = 0;
        while (x < rw) {
            const float a = fm_row[x];
            int64_t end = x + 1;
            if (a == 1.0f) {
                while (end < rw && fm_row[end] == 1.0f) ++end;
                std::memcpy(out_row + (x0 + x) * 3, crop_row + x * 3,
                            static_cast<size_t>(end - x) * 3);
            } else if (a == 0.0f) {
                while (end < rw && fm_row[end] == 0.0f) ++end;
                std::memcpy(out_row + (x0 + x) * 3, frame_row + (x0 + x) * 3,
                            static_cast<size_t>(end - x) * 3);
            } else {  // fractional alpha (XSeg blend): exact float path
                while (end < rw && fm_row[end] != 0.0f && fm_row[end] != 1.0f)
                    ++end;
                for (int64_t i = x; i < end; ++i) {
                    const float av = fm_row[i];
                    const float bv = 1.0f - av;
                    const uint8_t* c = crop_row + i * 3;
                    const uint8_t* f = frame_row + (x0 + i) * 3;
                    uint8_t* o = out_row + (x0 + i) * 3;
                    o[0] = static_cast<uint8_t>(c[0] * av + f[0] * bv);
                    o[1] = static_cast<uint8_t>(c[1] * av + f[1] * bv);
                    o[2] = static_cast<uint8_t>(c[2] * av + f[2] * bv);
                }
            }
            x = end;
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
