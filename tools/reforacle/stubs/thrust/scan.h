// Clean-room thrust stub: host inclusive_scan.
#pragma once
#include <numeric>

namespace thrust {

template <typename It, typename Out>
inline void inclusive_scan(It first, It last, Out out) {
    std::partial_sum(first, last, out);
}

}  // namespace thrust
