// Clean-room minimal rapidjson-compatible JSON DOM — just the surface the
// reference's cube_world.cc uses (Document/Value, ParseStream, HasMember,
// operator[], GetInt/GetFloat/GetDouble/GetString, Size).
#pragma once
#include <cassert>
#include <cctype>
#include <map>
#include <memory>
#include <string>
#include <vector>

namespace rapidjson {

typedef unsigned SizeType;

class Value {
public:
    enum Kind { kNull, kBool, kNumber, kString, kArray, kObject };
    Kind kind = kNull;
    double num = 0.0;
    bool boolean = false;
    std::string str;
    std::vector<Value> arr;
    std::vector<std::pair<std::string, Value>> obj;

    bool HasMember(const char* name) const {
        for (auto& kv : obj)
            if (kv.first == name) return true;
        return false;
    }
    const Value& operator[](const char* name) const {
        for (auto& kv : obj)
            if (kv.first == name) return kv.second;
        assert(false && "missing member");
        static Value dummy;
        return dummy;
    }
    const Value& operator[](SizeType i) const { return arr[i]; }
    const Value& operator[](int i) const { return arr[(size_t)i]; }
    SizeType Size() const { return (SizeType)arr.size(); }
    int GetInt() const { return (int)num; }
    double GetDouble() const { return num; }
    float GetFloat() const { return (float)num; }
    const char* GetString() const { return str.c_str(); }
    bool GetBool() const { return boolean; }
};

namespace detail {

struct Parser {
    const std::string& s;
    size_t pos = 0;
    explicit Parser(const std::string& text) : s(text) {}

    void ws() {
        while (pos < s.size() && std::isspace((unsigned char)s[pos])) pos++;
    }
    bool consume(char c) {
        ws();
        if (pos < s.size() && s[pos] == c) { pos++; return true; }
        return false;
    }
    Value parse() {
        ws();
        assert(pos < s.size());
        char c = s[pos];
        if (c == '{') return parse_object();
        if (c == '[') return parse_array();
        if (c == '"') return parse_string();
        if (c == 't' || c == 'f') return parse_bool();
        if (c == 'n') { pos += 4; return Value{}; }
        return parse_number();
    }
    Value parse_object() {
        Value v; v.kind = Value::kObject;
        consume('{');
        ws();
        if (consume('}')) return v;
        while (true) {
            ws();
            Value key = parse_string();
            consume(':');
            Value val = parse();
            v.obj.emplace_back(key.str, std::move(val));
            if (!consume(',')) break;
        }
        consume('}');
        return v;
    }
    Value parse_array() {
        Value v; v.kind = Value::kArray;
        consume('[');
        ws();
        if (consume(']')) return v;
        while (true) {
            v.arr.push_back(parse());
            if (!consume(',')) break;
        }
        consume(']');
        return v;
    }
    Value parse_string() {
        Value v; v.kind = Value::kString;
        consume('"');
        while (pos < s.size() && s[pos] != '"') {
            if (s[pos] == '\\' && pos + 1 < s.size()) {
                pos++;
                char e = s[pos];
                switch (e) {
                    case 'n': v.str += '\n'; break;
                    case 't': v.str += '\t'; break;
                    default: v.str += e; break;
                }
            } else {
                v.str += s[pos];
            }
            pos++;
        }
        pos++;  // closing quote
        return v;
    }
    Value parse_bool() {
        Value v; v.kind = Value::kBool;
        if (s.compare(pos, 4, "true") == 0) { v.boolean = true; pos += 4; }
        else { v.boolean = false; pos += 5; }
        return v;
    }
    Value parse_number() {
        Value v; v.kind = Value::kNumber;
        size_t start = pos;
        while (pos < s.size() &&
               (std::isdigit((unsigned char)s[pos]) || s[pos] == '-' ||
                s[pos] == '+' || s[pos] == '.' || s[pos] == 'e' || s[pos] == 'E'))
            pos++;
        v.num = std::stod(s.substr(start, pos - start));
        return v;
    }
};

}  // namespace detail

class Document : public Value {
public:
    template <typename Stream>
    void ParseStream(Stream& stream) {
        detail::Parser p(stream.text());
        *(Value*)this = p.parse();
    }
};

}  // namespace rapidjson
