// Native LAS point-cloud codec.
//
// Reference parity: `io/las_pointcloud_io.{h,cpp}` (2875 LoC) — LAS
// 1.0-1.4 public header block, point records.  This codec covers the
// common core: LAS 1.2-1.4 headers, point formats 0-3 (XYZ + intensity +
// return info + classification, plus GPS time for 1/3 and RGB for 2/3),
// with scale/offset application on read and synthesis on write.
//
// Exposed as a C ABI consumed through ctypes (`pointcloud_io.py`); all
// bulk data moves as flat arrays so the Python side wraps it zero-copy.

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <cstdlib>
#include <vector>

extern "C" {

struct LasInfo {
    uint8_t version_major;
    uint8_t version_minor;
    uint8_t point_format;
    uint16_t point_record_len;
    uint64_t n_points;
    uint32_t header_size;
    uint64_t offset_to_points;
    double scale[3];
    double offset[3];
    double mins[3];
    double maxs[3];
};

static uint64_t read_n_points(const unsigned char* h, uint8_t minor) {
    uint32_t legacy;
    std::memcpy(&legacy, h + 107, 4);
    if (minor >= 4) {
        uint64_t full;
        std::memcpy(&full, h + 247, 8);
        if (full > 0) return full;
    }
    return legacy;
}

int las_read_info(const char* path, LasInfo* info) {
    std::FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    unsigned char h[375];
    size_t n = std::fread(h, 1, sizeof(h), f);
    if (n < 227 || std::memcmp(h, "LASF", 4) != 0) { std::fclose(f); return -2; }
    info->version_major = h[24];
    info->version_minor = h[25];
    uint16_t header_size;
    std::memcpy(&header_size, h + 94, 2);
    info->header_size = header_size;
    uint32_t off;
    std::memcpy(&off, h + 96, 4);
    info->offset_to_points = off;
    info->point_format = h[104] & 0x3F;  // mask compression bit
    std::memcpy(&info->point_record_len, h + 105, 2);
    info->n_points = read_n_points(h, info->version_minor);
    std::memcpy(info->scale, h + 131, 24);
    std::memcpy(info->offset, h + 155, 24);
    // header stores max_x, min_x, max_y, min_y, max_z, min_z
    double mm[6];
    std::memcpy(mm, h + 179, 48);
    info->maxs[0] = mm[0]; info->mins[0] = mm[1];
    info->maxs[1] = mm[2]; info->mins[1] = mm[3];
    info->maxs[2] = mm[4]; info->mins[2] = mm[5];
    std::fclose(f);
    return 0;
}

// Reads points into caller-allocated arrays (any pointer may be null to
// skip that attribute).  Returns the number of points read, or < 0 on
// error.
long long las_read_points(const char* path, double* xyz,
                          uint16_t* intensity, uint8_t* classification,
                          double* gps_time, uint16_t* rgb) {
    LasInfo info;
    int rc = las_read_info(path, &info);
    if (rc != 0) return rc;
    if (info.point_format > 10) return -3;

    std::FILE* f = std::fopen(path, "rb");
    if (!f) return -1;
    if (std::fseek(f, (long)info.offset_to_points, SEEK_SET) != 0) {
        std::fclose(f); return -4;
    }

    const size_t rec = info.point_record_len;
    std::vector<unsigned char> buf(rec * 4096);
    uint64_t remaining = info.n_points;
    uint64_t idx = 0;

    // Layouts: formats 0-3 (LAS <= 1.3) have classification at 15, gps at
    // 20 (fmt 1/3), rgb at 20 (fmt 2) or 28 (fmt 3); formats 6-8 (LAS 1.4)
    // have classification at 16, gps at 22, rgb at 30 (fmt 7/8).
    // formats 4/5 are 1/3 + waveform packets (same prefix layout);
    // formats 9/10 are 6/7 + waveform packets
    const uint8_t pf = info.point_format;
    const bool new_fmt = pf >= 6;
    const bool has_gps = pf == 1 || pf >= 3;
    const size_t cls_off = new_fmt ? 16 : 15;
    const size_t gps_off = new_fmt ? 22 : 20;
    const size_t rgb_off = (pf == 3 || pf == 5) ? 28
                          : (pf == 2) ? 20
                          : (pf == 7 || pf == 8 || pf == 10) ? 30 : 0;

    while (remaining > 0) {
        size_t chunk = remaining < 4096 ? (size_t)remaining : 4096;
        size_t got = std::fread(buf.data(), rec, chunk, f);
        if (got == 0) break;
        for (size_t k = 0; k < got; k++) {
            const unsigned char* p = buf.data() + k * rec;
            int32_t xi, yi, zi;
            std::memcpy(&xi, p + 0, 4);
            std::memcpy(&yi, p + 4, 4);
            std::memcpy(&zi, p + 8, 4);
            if (xyz) {
                xyz[3 * idx + 0] = xi * info.scale[0] + info.offset[0];
                xyz[3 * idx + 1] = yi * info.scale[1] + info.offset[1];
                xyz[3 * idx + 2] = zi * info.scale[2] + info.offset[2];
            }
            if (intensity) std::memcpy(&intensity[idx], p + 12, 2);
            if (classification) classification[idx] = p[cls_off];
            if (gps_time && has_gps) std::memcpy(&gps_time[idx], p + gps_off, 8);
            if (rgb && rgb_off) std::memcpy(&rgb[3 * idx], p + rgb_off, 6);
            idx++;
        }
        remaining -= got;
    }
    std::fclose(f);
    return (long long)idx;
}

// Writes a LAS 1.2 file with the requested point format (0-3).
int las_write_points(const char* path, const double* xyz, long long n,
                     const uint16_t* intensity,
                     const uint8_t* classification, const double* gps_time,
                     const uint16_t* rgb, int point_format) {
    if (point_format < 0 || point_format > 3) return -3;
    static const uint16_t fmt_len[4] = {20, 28, 26, 34};
    const uint16_t rec = fmt_len[point_format];

    double mins[3] = {1e300, 1e300, 1e300};
    double maxs[3] = {-1e300, -1e300, -1e300};
    for (long long i = 0; i < n; i++) {
        for (int a = 0; a < 3; a++) {
            double v = xyz[3 * i + a];
            if (v < mins[a]) mins[a] = v;
            if (v > maxs[a]) maxs[a] = v;
        }
    }
    if (n == 0) { mins[0] = mins[1] = mins[2] = 0; maxs[0] = maxs[1] = maxs[2] = 0; }
    double scale[3] = {1e-4, 1e-4, 1e-4};
    double offset[3] = {mins[0], mins[1], mins[2]};

    std::FILE* f = std::fopen(path, "wb");
    if (!f) return -1;

    unsigned char h[227];
    std::memset(h, 0, sizeof(h));
    std::memcpy(h, "LASF", 4);
    h[24] = 1; h[25] = 2;                        // version 1.2
    uint16_t header_size = 227;
    std::memcpy(h + 94, &header_size, 2);
    uint32_t off = 227;
    std::memcpy(h + 96, &off, 4);
    h[104] = (uint8_t)point_format;
    std::memcpy(h + 105, &rec, 2);
    uint32_t n32 = (uint32_t)n;
    std::memcpy(h + 107, &n32, 4);
    std::memcpy(h + 111, &n32, 4);               // points by return [0]
    std::memcpy(h + 131, scale, 24);
    std::memcpy(h + 155, offset, 24);
    double mm[6] = {maxs[0], mins[0], maxs[1], mins[1], maxs[2], mins[2]};
    std::memcpy(h + 179, mm, 48);
    if (std::fwrite(h, 1, sizeof(h), f) != sizeof(h)) { std::fclose(f); return -5; }

    std::vector<unsigned char> p(rec);
    const bool has_gps = point_format == 1 || point_format == 3;
    const size_t rgb_off = (point_format == 3) ? 28
                          : (point_format == 2) ? 20 : 0;
    for (long long i = 0; i < n; i++) {
        std::memset(p.data(), 0, rec);
        for (int a = 0; a < 3; a++) {
            double v = (xyz[3 * i + a] - offset[a]) / scale[a];
            int32_t q = (int32_t)(v < 0 ? v - 0.5 : v + 0.5);
            std::memcpy(p.data() + 4 * a, &q, 4);
        }
        if (intensity) std::memcpy(p.data() + 12, &intensity[i], 2);
        p[14] = 0x11;  // return 1 of 1
        if (classification) p[15] = classification[i];
        if (has_gps) {
            double t = gps_time ? gps_time[i] : 0.0;
            std::memcpy(p.data() + 20, &t, 8);
        }
        if (rgb_off && rgb) std::memcpy(p.data() + rgb_off, &rgb[3 * i], 6);
        if (std::fwrite(p.data(), 1, rec, f) != rec) { std::fclose(f); return -5; }
    }
    return std::fclose(f) == 0 ? 0 : -6;
}

}  // extern "C"
