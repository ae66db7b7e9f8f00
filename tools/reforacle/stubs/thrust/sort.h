// Clean-room thrust stub: host std::sort-based sort_by_key.
#pragma once
#include <algorithm>
#include <numeric>
#include <vector>

namespace thrust {

struct device_t {};
static const device_t device{};

template <typename Key, typename Val>
inline void sort_by_key(device_t, Key* keys_first, Key* keys_last, Val* values) {
    size_t n = keys_last - keys_first;
    std::vector<size_t> idx(n);
    std::iota(idx.begin(), idx.end(), 0);
    std::stable_sort(idx.begin(), idx.end(), [&](size_t a, size_t b) {
        return keys_first[a] < keys_first[b];
    });
    std::vector<Key> k(keys_first, keys_last);
    std::vector<Val> v(values, values + n);
    for (size_t i = 0; i < n; i++) {
        keys_first[i] = k[idx[i]];
        values[i] = v[idx[i]];
    }
}

}  // namespace thrust
