#pragma once
#include <istream>
#include <sstream>
#include <string>

namespace rapidjson {

class IStreamWrapper {
    std::string buf;

public:
    explicit IStreamWrapper(std::istream& is) {
        std::ostringstream ss;
        ss << is.rdbuf();
        buf = ss.str();
    }
    const std::string& text() const { return buf; }
};

}  // namespace rapidjson
