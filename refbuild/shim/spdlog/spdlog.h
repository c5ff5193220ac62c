// Minimal spdlog API stub — just enough to compile the reference HINGE stage
// binaries (filter/maximal/hinging/draft/consensus) for the parity harness.
// Covers: sink_ptr, sinks::{stdout_sink_st,daily_file_sink_st}, logger with
// {}-substitution info/warn/error/debug, register_logger.
// Original API: github.com/gabime/spdlog (the reference vendors it as an
// empty git submodule at src/spdlog — see /root/reference/.gitmodules).
#pragma once
#include <cstdio>
#include <memory>
#include <sstream>
#include <string>
#include <vector>

namespace spdlog {

class sink {
public:
    virtual ~sink() {}
    virtual void log(const std::string &msg) = 0;
};

using sink_ptr = std::shared_ptr<sink>;

namespace sinks {

class stdout_sink_st : public sink {
public:
    void log(const std::string &msg) override {
        std::fputs(msg.c_str(), stdout);
        std::fputc('\n', stdout);
        std::fflush(stdout);
    }
};

class daily_file_sink_st : public sink {
public:
    daily_file_sink_st(const std::string &base_filename, int /*hour*/, int /*minute*/) {
        fp_ = std::fopen(base_filename.c_str(), "a");
    }
    ~daily_file_sink_st() override {
        if (fp_) std::fclose(fp_);
    }
    void log(const std::string &msg) override {
        if (!fp_) return;
        std::fputs(msg.c_str(), fp_);
        std::fputc('\n', fp_);
        std::fflush(fp_);
    }

private:
    std::FILE *fp_ = nullptr;
};

} // namespace sinks

namespace detail {

inline void format_rest(std::ostringstream &os, const char *fmt) { os << fmt; }

template <typename T, typename... Rest>
void format_rest(std::ostringstream &os, const char *fmt, const T &v, Rest &&...rest) {
    // Substitute the next "{}" (the reference never uses format specs).
    for (const char *p = fmt; *p; ++p) {
        if (p[0] == '{' && p[1] == '}') {
            os << v;
            format_rest(os, p + 2, std::forward<Rest>(rest)...);
            return;
        }
        os << *p;
    }
}

} // namespace detail

class logger {
public:
    template <typename It>
    logger(const std::string &name, It first, It last) : name_(name), sinks_(first, last) {}

    template <typename... Args>
    void info(const char *fmt, Args &&...args) { write_("info", fmt, std::forward<Args>(args)...); }
    template <typename... Args>
    void warn(const char *fmt, Args &&...args) { write_("warning", fmt, std::forward<Args>(args)...); }
    template <typename... Args>
    void error(const char *fmt, Args &&...args) { write_("error", fmt, std::forward<Args>(args)...); }
    template <typename... Args>
    void debug(const char *fmt, Args &&...args) { write_("debug", fmt, std::forward<Args>(args)...); }
    void flush() {}

private:
    template <typename... Args>
    void write_(const char *level, const char *fmt, Args &&...args) {
        std::ostringstream os;
        os << "[" << name_ << "] [" << level << "] ";
        detail::format_rest(os, fmt, std::forward<Args>(args)...);
        const std::string line = os.str();
        for (auto &s : sinks_) s->log(line);
    }

    std::string name_;
    std::vector<sink_ptr> sinks_;
};

inline void register_logger(const std::shared_ptr<logger> &) {}

} // namespace spdlog
