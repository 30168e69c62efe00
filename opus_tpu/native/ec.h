// Shared byte-wise range decoder + Laplace (RFC 6716 sec. 4.1).
// Extracted from celt_frontend.cpp; used by both the CELT and SILK
// native plane-A engines.  Mirrors opus_tpu/rc (bit-exact).
#pragma once
#include <cstdint>
#include <algorithm>

namespace opusfe {


// ---------------------------------------------------------------------------
// Range decoder (RFC 6716 sec. 4.1) — mirrors opus_tpu/rc/decoder.py.
// ---------------------------------------------------------------------------

constexpr int BITRES = 3;
constexpr int UINT_BITS = 8;
constexpr int WINDOW_SIZE = 32;
constexpr int SYM_BITS = 8;
constexpr int CODE_BITS = 32;
constexpr uint32_t SYM_MAX = (1u << SYM_BITS) - 1;
constexpr uint32_t CODE_TOP = 1u << (CODE_BITS - 1);
constexpr uint32_t CODE_BOT = CODE_TOP >> SYM_BITS;
constexpr int CODE_EXTRA = (CODE_BITS - 2) % SYM_BITS + 1;

static inline int ilog32(uint32_t v) { return v ? 32 - __builtin_clz(v) : 0; }

constexpr uint16_t TELL_FRAC_CORR[8] = {35733, 38967, 42495, 46340, 50535, 55109, 60097, 65535};

struct RangeDec {
    const uint8_t* buf;
    int storage;
    int offs;
    int end_offs;
    uint32_t end_window;
    int nend_bits;
    int bits_total;
    uint32_t rng;
    uint32_t val;
    uint32_t ext;
    bool error;
    uint32_t rem;

    int read_byte() { return offs < storage ? buf[offs++] : 0; }
    int read_byte_from_end() {
        if (end_offs < storage) { end_offs++; return buf[storage - end_offs]; }
        return 0;
    }
    void normalize() {
        while (rng <= CODE_BOT) {
            bits_total += SYM_BITS;
            rng <<= SYM_BITS;
            uint32_t sym = rem;
            rem = (uint32_t)read_byte();
            sym = ((sym << SYM_BITS) | rem) >> (SYM_BITS - CODE_EXTRA);
            val = ((val << SYM_BITS) + (SYM_MAX & ~sym)) & (CODE_TOP - 1);
        }
    }
    void init(const uint8_t* b, int len) {
        buf = b; storage = len; offs = 0;
        end_offs = 0; end_window = 0; nend_bits = 0;
        bits_total = CODE_BITS + 1 - ((CODE_BITS - CODE_EXTRA) / SYM_BITS) * SYM_BITS;
        ext = 0; error = false;
        rng = 1u << CODE_EXTRA;
        rem = (uint32_t)read_byte();
        val = rng - 1 - (rem >> (SYM_BITS - CODE_EXTRA));
        normalize();
    }
    int tell() const { return bits_total - ilog32(rng); }
    uint32_t tell_frac() const {
        uint32_t bits = (uint32_t)bits_total << BITRES;
        int l = ilog32(rng);
        uint32_t r = rng >> (l - 16);
        int b = (int)(r >> 12) - 8;
        if (r > TELL_FRAC_CORR[b]) b++;
        return bits - (uint32_t)((l << 3) + b);
    }
    uint32_t decode(uint32_t ft) {
        ext = rng / ft;
        uint32_t s = val / ext;
        return ft - std::min(s + 1, ft);
    }
    uint32_t decode_bin(int bits) {
        ext = rng >> bits;
        uint32_t s = val / ext;
        return (1u << bits) - std::min(s + 1, (uint32_t)1 << bits);
    }
    void update(uint32_t fl, uint32_t fh, uint32_t ft) {
        uint32_t s = ext * (ft - fh);
        val -= s;
        rng = fl > 0 ? ext * (fh - fl) : rng - s;
        normalize();
    }
    bool decode_bit_logp(int logp) {
        uint32_t r = rng, d = val;
        uint32_t s = r >> logp;
        bool ret = d < s;
        if (!ret) val = d - s;
        rng = ret ? s : r - s;
        normalize();
        return ret;
    }
    int decode_icdf(const uint8_t* icdf, int ftb) {
        uint32_t s = rng, d = val, t;
        uint32_t r = s >> ftb;
        int ret = -1;
        do {
            ret++;
            t = s;
            s = r * icdf[ret];
        } while (d < s);
        val = d - s;
        rng = t - s;
        normalize();
        return ret;
    }
    uint32_t decode_bits(int bits) {
        uint32_t window = end_window;
        int available = nend_bits;
        if (available < bits) {
            do {
                window |= (uint32_t)read_byte_from_end() << available;
                available += SYM_BITS;
            } while (available <= WINDOW_SIZE - SYM_BITS);
        }
        uint32_t ret = window & ((bits < 32 ? (1u << bits) : 0u) - 1u);
        window >>= bits;
        available -= bits;
        end_window = window;
        nend_bits = available;
        bits_total += bits;
        return ret;
    }
    uint32_t decode_uint(uint32_t ft) {
        // ft > 1 guaranteed by callers.
        ft--;
        int ftb = ilog32(ft);
        if (ftb > UINT_BITS) {
            ftb -= UINT_BITS;
            uint32_t ft1 = (ft >> ftb) + 1;
            uint32_t s = decode(ft1);
            update(s, s + 1, ft1);
            uint32_t t = (s << ftb) | decode_bits(ftb);
            if (t <= ft) return t;
            error = true;
            return ft;
        }
        uint32_t s = decode(ft + 1);
        update(s, s + 1, ft + 1);
        return s;
    }
};

// ---------------------------------------------------------------------------
// Laplace decode (opus_tpu/rc/laplace.py).
// ---------------------------------------------------------------------------

constexpr int LAPLACE_MINP = 1;
constexpr int LAPLACE_NMIN = 16;

static int laplace_freq1(int fs0, int decay) {
    int ft = 32768 - LAPLACE_MINP * (2 * LAPLACE_NMIN) - fs0;
    return (ft * (16384 - decay)) >> 15;
}

static int decode_laplace(RangeDec& dec, int fs, int decay) {
    int val = 0;
    uint32_t fl = 0;
    uint32_t fm = dec.decode_bin(15);
    if (fm >= (uint32_t)fs) {
        val += 1;
        fl = fs;
        fs = laplace_freq1(fs, decay) + LAPLACE_MINP;
        while (fs > LAPLACE_MINP && fm >= fl + 2 * (uint32_t)fs) {
            fs *= 2;
            fl += fs;
            fs = ((fs - 2 * LAPLACE_MINP) * decay) >> 15;
            fs += LAPLACE_MINP;
            val += 1;
        }
        if (fs <= LAPLACE_MINP) {
            int di = (int)((fm - fl) >> 1);
            val += di;
            fl += 2u * (uint32_t)di * LAPLACE_MINP;
        }
        if (fm < fl + (uint32_t)fs) {
            val = -val;
        } else {
            fl += fs;
        }
    }
    uint32_t fh = std::min<uint32_t>(fl + fs, 32768);
    dec.update(fl, fh, 32768);
    return val;
}


}  // namespace opusfe
