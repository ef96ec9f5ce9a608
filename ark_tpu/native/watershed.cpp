// Marker-based watershed (priority-flood) — native host kernel.
//
// The deep-watershed postprocess of the Mesmer segmentation model (and the
// classical fiber pipeline) needs a sequential priority-flood that does not
// map to XLA; the reference delegated it to skimage's C implementation inside
// the remote DeepCell service. This is a fresh C++ implementation exposed via
// a C ABI for ctypes.
//
// watershed(image, markers, mask, H, W, out):
//   floods ascending `image` values from the labeled `markers`, restricted to
//   `mask` (mask==0 pixels stay 0). 4-connected.

#include <cstdint>
#include <queue>
#include <vector>

namespace {

struct Node {
    float value;
    int64_t order;   // FIFO tiebreak for equal values (stable flooding)
    int32_t idx;
};

struct NodeCmp {
    bool operator()(const Node& a, const Node& b) const {
        if (a.value != b.value) return a.value > b.value;  // min-heap on value
        return a.order > b.order;
    }
};

}  // namespace

extern "C" {

void watershed(const float* image, const int32_t* markers,
               const uint8_t* mask, int32_t H, int32_t W, int32_t* out) {
    const int64_t n = static_cast<int64_t>(H) * W;
    std::priority_queue<Node, std::vector<Node>, NodeCmp> heap;
    std::vector<uint8_t> visited(n, 0);
    int64_t order = 0;

    for (int64_t i = 0; i < n; ++i) {
        out[i] = 0;
        if (markers[i] > 0 && mask[i]) {
            out[i] = markers[i];
            visited[i] = 1;
            heap.push({image[i], order++, static_cast<int32_t>(i)});
        }
    }

    const int32_t drow[4] = {-1, 1, 0, 0};
    const int32_t dcol[4] = {0, 0, -1, 1};

    while (!heap.empty()) {
        Node node = heap.top();
        heap.pop();
        const int32_t r = node.idx / W;
        const int32_t c = node.idx % W;
        const int32_t label = out[node.idx];
        for (int k = 0; k < 4; ++k) {
            const int32_t rr = r + drow[k];
            const int32_t cc = c + dcol[k];
            if (rr < 0 || rr >= H || cc < 0 || cc >= W) continue;
            const int64_t j = static_cast<int64_t>(rr) * W + cc;
            if (visited[j] || !mask[j]) continue;
            visited[j] = 1;
            out[j] = label;
            heap.push({image[j], order++, static_cast<int32_t>(j)});
        }
    }
}

// Connected-component labeling (4-connected) for completeness; scipy is the
// usual host path, this exists for zero-scipy callers and as a native fallback.
void label_components(const uint8_t* mask, int32_t H, int32_t W,
                      int32_t* out, int32_t* n_labels) {
    const int64_t n = static_cast<int64_t>(H) * W;
    for (int64_t i = 0; i < n; ++i) out[i] = 0;
    int32_t next = 0;
    std::vector<int32_t> stack;
    const int32_t drow[4] = {-1, 1, 0, 0};
    const int32_t dcol[4] = {0, 0, -1, 1};
    for (int64_t i = 0; i < n; ++i) {
        if (!mask[i] || out[i]) continue;
        ++next;
        out[i] = next;
        stack.push_back(static_cast<int32_t>(i));
        while (!stack.empty()) {
            const int32_t cur = stack.back();
            stack.pop_back();
            const int32_t r = cur / W, c = cur % W;
            for (int k = 0; k < 4; ++k) {
                const int32_t rr = r + drow[k], cc = c + dcol[k];
                if (rr < 0 || rr >= H || cc < 0 || cc >= W) continue;
                const int64_t j = static_cast<int64_t>(rr) * W + cc;
                if (mask[j] && !out[j]) {
                    out[j] = next;
                    stack.push_back(static_cast<int32_t>(j));
                }
            }
        }
    }
    *n_labels = next;
}

}  // extern "C"
