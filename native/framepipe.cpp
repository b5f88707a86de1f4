// framepipe: multi-threaded frame decode + ring buffer (C ABI).
//
// TPU-native runtime analog of the reference's threaded input pipeline
// (/root/reference/include/mtf/TrackerStrct_mt.h:25-300 — InputThread +
// frame ring buffer behind pyMTF2/mexMTF2, and the InputBase ring buffer
// of Utilities/src/inputUtils.cc). Decoding/IO runs in native threads so
// the Python host loop only moves ready float32 frames to the device —
// the host never stalls the TPU on JPEG decode.
//
// C API (ctypes-friendly):
//   void* fp_open(const char* source, int buf_size, int n_threads);
//   void* fp_open2(const char* source, int buf_size, int n_threads,
//                  const char* preproc, double p1, double p2,
//                  int to_gray);
//   int   fp_dims(void* h, int* height, int* width, int* channels);
//   int   fp_total(void* h);                       // -1 if unknown (camera)
//   int   fp_next(void* h, float* out, int capacity);  // -> frame id or -1
//   void  fp_close(void* h);
//
// source: image directory (sorted *.jpg/*.png/*.bmp), video file, or
// "cam:N" for a capture device. Frames are converted to grayscale float32
// unless the source is color (then HWC float32 RGB).
//
// fp_open2 additionally runs the reference's host-side preprocessing
// chain (preprocUtils.cc, pipeline.h:178-247: none/gauss/med/box/bil/
// sobel + grayscale convert) INSIDE the decode workers, so filtering
// overlaps device compute instead of stalling the Python host loop.

#include <opencv2/core.hpp>
#include <opencv2/imgcodecs.hpp>
#include <opencv2/imgproc.hpp>
#include <opencv2/videoio.hpp>

#include <algorithm>
#include <atomic>
#include <condition_variable>
#include <cstring>
#include <deque>
#include <filesystem>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace fs = std::filesystem;

namespace {

struct Frame {
    int id;
    cv::Mat data;  // CV_32F or CV_32FC3
};

enum PreprocKind { PP_NONE = 0, PP_GAUSS, PP_MED, PP_BOX, PP_BIL, PP_SOBEL };

struct Preproc {
    int kind = PP_NONE;
    double p1 = 0.0, p2 = 0.0;
    bool to_gray = false;
};

struct Pipe {
    // config
    std::vector<std::string> files;  // image-dir mode
    std::string video;               // video/camera mode
    int buf_size;
    int n_threads;

    // dims (filled from the first frame)
    int height = 0, width = 0, channels = 0;

    // ring buffer ordered by frame id
    std::mutex mu;
    std::condition_variable cv_push, cv_pop;
    std::deque<Frame> buf;
    int next_emit = 0;       // next id the consumer receives
    int next_decode = 0;     // next id a worker claims (image-dir mode)
    std::atomic<bool> done{false}, stop{false};

    std::vector<std::thread> workers;
    cv::VideoCapture cap;    // video mode (single reader thread)
    Preproc pp;
};

cv::Mat to_float(const cv::Mat& m, const Preproc& pp) {
    cv::Mat work = m;
    if (pp.to_gray && work.channels() == 3)
        cv::cvtColor(work, work, cv::COLOR_BGR2GRAY);
    // filter chain (preprocUtils.cc semantics); ksize from p1, odd-clamped
    int k = std::max(1, (int)pp.p1) | 1;
    switch (pp.kind) {
        case PP_GAUSS: cv::GaussianBlur(work, work, {k, k}, pp.p2); break;
        case PP_MED:   cv::medianBlur(work, work, k); break;
        case PP_BOX:   cv::blur(work, work, {k, k}); break;
        case PP_BIL: {
            cv::Mat dst;
            cv::bilateralFilter(work, dst, (int)pp.p1,
                                pp.p2 > 0 ? pp.p2 : 50.0,
                                pp.p2 > 0 ? pp.p2 : 50.0);
            work = dst;
            break;
        }
        case PP_SOBEL: {
            if (work.channels() == 3)
                cv::cvtColor(work, work, cv::COLOR_BGR2GRAY);
            cv::Mat gx, gy;
            cv::Sobel(work, gx, CV_32F, 1, 0, k > 1 ? k : 3);
            cv::Sobel(work, gy, CV_32F, 0, 1, k > 1 ? k : 3);
            cv::magnitude(gx, gy, work);
            break;
        }
        default: break;
    }
    cv::Mat f;
    if (work.channels() == 3) {
        cv::Mat rgb;
        cv::cvtColor(work, rgb, cv::COLOR_BGR2RGB);
        rgb.convertTo(f, CV_32FC3);
    } else {
        work.convertTo(f, CV_32F);
    }
    return f;
}

// Image-directory worker: claim ids, decode, insert in-order window.
void dir_worker(Pipe* p) {
    for (;;) {
        int id;
        {
            std::lock_guard<std::mutex> lk(p->mu);
            if (p->stop || p->next_decode >= (int)p->files.size()) return;
            id = p->next_decode++;
        }
        cv::Mat img = cv::imread(p->files[id], cv::IMREAD_UNCHANGED);
        if (img.empty()) img = cv::Mat::zeros(p->height ? p->height : 1,
                                              p->width ? p->width : 1, CV_8U);
        Frame f{id, to_float(img, p->pp)};
        std::unique_lock<std::mutex> lk(p->mu);
        // bound the buffer by (emit window + buf_size)
        p->cv_push.wait(lk, [&] {
            return p->stop || id < p->next_emit + p->buf_size;
        });
        if (p->stop) return;
        p->buf.push_back(std::move(f));
        p->cv_pop.notify_all();
    }
}

// Video worker: sequential decode (capture handles are not thread-safe).
void video_worker(Pipe* p) {
    int id = 0;
    for (;;) {
        if (p->stop) return;
        cv::Mat img;
        if (!p->cap.read(img) || img.empty()) break;
        Frame f{id++, to_float(img, p->pp)};
        std::unique_lock<std::mutex> lk(p->mu);
        p->cv_push.wait(lk, [&] {
            return p->stop || (int)p->buf.size() < p->buf_size;
        });
        if (p->stop) return;
        p->buf.push_back(std::move(f));
        p->cv_pop.notify_all();
    }
    p->done = true;
    std::lock_guard<std::mutex> lk(p->mu);
    p->cv_pop.notify_all();
}

bool has_image_ext(const fs::path& q) {
    auto e = q.extension().string();
    std::transform(e.begin(), e.end(), e.begin(), ::tolower);
    return e == ".jpg" || e == ".jpeg" || e == ".png" || e == ".bmp" ||
           e == ".ppm" || e == ".pgm" || e == ".tif" || e == ".tiff";
}

Preproc parse_preproc(const char* name, double p1, double p2, int to_gray) {
    Preproc pp;
    pp.p1 = p1;
    pp.p2 = p2;
    pp.to_gray = to_gray != 0;
    std::string s = name ? name : "none";
    if (s == "gauss") pp.kind = PP_GAUSS;
    else if (s == "med") pp.kind = PP_MED;
    else if (s == "box") pp.kind = PP_BOX;
    else if (s == "bil") pp.kind = PP_BIL;
    else if (s == "sobel") pp.kind = PP_SOBEL;
    else pp.kind = PP_NONE;  // "none"/"raw" and unknown names pass through
    return pp;
}

void* open_impl(const char* source, int buf_size, int n_threads, Preproc pp) {
    auto* p = new Pipe();
    p->pp = pp;
    p->buf_size = buf_size > 0 ? buf_size : 8;
    p->n_threads = n_threads > 0 ? n_threads : 2;
    std::string src(source);

    if (fs::is_directory(src)) {
        for (auto& q : fs::directory_iterator(src))
            if (q.is_regular_file() && has_image_ext(q.path()))
                p->files.push_back(q.path().string());
        std::sort(p->files.begin(), p->files.end());
        if (p->files.empty()) { delete p; return nullptr; }
        cv::Mat first = cv::imread(p->files[0], cv::IMREAD_UNCHANGED);
        if (first.empty()) { delete p; return nullptr; }
        p->height = first.rows;
        p->width = first.cols;
        p->channels = first.channels() == 3 ? 3 : 1;
        int nt = std::min<int>(p->n_threads, (int)p->files.size());
        for (int i = 0; i < nt; ++i)
            p->workers.emplace_back(dir_worker, p);
    } else {
        if (src.rfind("cam:", 0) == 0)
            p->cap.open(std::stoi(src.substr(4)));
        else
            p->cap.open(src);
        if (!p->cap.isOpened()) { delete p; return nullptr; }
        p->height = (int)p->cap.get(cv::CAP_PROP_FRAME_HEIGHT);
        p->width = (int)p->cap.get(cv::CAP_PROP_FRAME_WIDTH);
        p->channels = 3;
        p->workers.emplace_back(video_worker, p);
    }
    if (p->pp.to_gray || p->pp.kind == PP_SOBEL) p->channels = 1;
    return p;
}

}  // namespace

extern "C" {

void* fp_open(const char* source, int buf_size, int n_threads) {
    return open_impl(source, buf_size, n_threads, Preproc{});
}

void* fp_open2(const char* source, int buf_size, int n_threads,
               const char* preproc, double p1, double p2, int to_gray) {
    return open_impl(source, buf_size, n_threads,
                     parse_preproc(preproc, p1, p2, to_gray));
}

int fp_dims(void* h, int* height, int* width, int* channels) {
    if (!h) return -1;
    auto* p = static_cast<Pipe*>(h);
    *height = p->height;
    *width = p->width;
    *channels = p->channels;
    return 0;
}

int fp_total(void* h) {
    if (!h) return -1;
    auto* p = static_cast<Pipe*>(h);
    return p->files.empty() ? -1 : (int)p->files.size();
}

int fp_next(void* h, float* out, int capacity) {
    if (!h) return -1;
    auto* p = static_cast<Pipe*>(h);
    std::unique_lock<std::mutex> lk(p->mu);
    const bool dir_mode = !p->files.empty();
    for (;;) {
        auto it = std::find_if(p->buf.begin(), p->buf.end(), [&](const Frame& f) {
            return f.id == p->next_emit;
        });
        if (it != p->buf.end()) {
            const cv::Mat& m = it->data;
            int n = m.rows * m.cols * m.channels();
            if (n > capacity) return -2;
            std::memcpy(out, m.ptr<float>(0), n * sizeof(float));
            int id = it->id;
            p->buf.erase(it);
            p->next_emit++;
            p->cv_push.notify_all();
            return id;
        }
        bool exhausted = dir_mode
            ? (p->next_emit >= (int)p->files.size())
            : (p->done && p->buf.empty());
        if (exhausted || p->stop) return -1;
        p->cv_pop.wait(lk);
    }
}

void fp_close(void* h) {
    if (!h) return;
    auto* p = static_cast<Pipe*>(h);
    {
        std::lock_guard<std::mutex> lk(p->mu);
        p->stop = true;
        p->cv_push.notify_all();
        p->cv_pop.notify_all();
    }
    for (auto& t : p->workers) t.join();
    delete p;
}

}  // extern "C"
