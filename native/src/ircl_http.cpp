// Native HTTP/1.1 front for the ircl_tpu serving layer.
//
// The measured bottleneck in the round-5 serving bench was the stdlib
// transport, not the engine: ThreadingHTTPServer (thread per connection,
// Python header parsing, HTTP/1.0 connection-per-request) capped at
// ~60-70 req/s on this 1-core host while the BatchingService underneath
// sustained 538 q/s.  This file is the C-grade front that RESULTS.md said
// a production deployment would want: ONE epoll event-loop thread owns
// accept/read/parse/write with keep-alive; Python worker threads pull
// complete requests through ctypes (the GIL is released for the duration
// of the blocking call) and push JSON replies back.  Routing and request
// semantics stay in Python (ircl_tpu/serve_native.py reuses serve.py's
// _handle), so the two fronts answer byte-identically.
//
// Reference analogue: none — the reference's only serving surface is a
// ThreadPool batch-scoring helper (preprocessing/drqa/retriever/
// tfidf_doc_ranker.py:77-84).  This is new TPU-framework surface.
//
// API (ctypes, see ircl_tpu/serve_native.py):
//   void*     ih_start(host, port, max_body)   start loop thread; NULL on error
//   int       ih_port(h)                       actual bound port
//   long long ih_next(h, timeout_ms, meta, meta_cap, &body, &body_len)
//             -> id > 0 (request; meta = "METHOD PATH", body valid until
//                ih_respond(id)), 0 on timeout, -1 after ih_stop
//   int       ih_respond(h, id, status, body, len, close_conn)
//             -> 1 delivered/queued, 0 connection already gone
//   void      ih_stop(h)
//
// Build: g++ -O3 -shared -fPIC -std=c++17 -pthread (utils/native_build.py).

#include <arpa/inet.h>
#include <errno.h>
#include <fcntl.h>
#include <netinet/in.h>
#include <netinet/tcp.h>
#include <string.h>
#include <sys/epoll.h>
#include <sys/eventfd.h>
#include <sys/socket.h>
#include <unistd.h>

#include <atomic>
#include <cctype>
#include <chrono>
#include <condition_variable>
#include <cstdio>
#include <cstdlib>
#include <cstdint>
#include <deque>
#include <memory>
#include <mutex>
#include <string>
#include <thread>
#include <unordered_map>
#include <vector>

namespace {

struct Request {
  long long id;
  int fd;
  uint64_t gen;  // connection generation: detects fd reuse after close
  bool client_close;  // request carried "Connection: close"
  std::string method;
  std::string path;
  std::string body;
};

struct Conn {
  uint64_t gen = 0;
  std::string in;
  std::string out;
  bool outstanding = false;  // one in-flight request per connection
  bool close_after_write = false;
  bool want_write = false;
};

struct Response {
  long long id;
  int fd;
  uint64_t gen;
  std::string data;  // fully serialized HTTP response
  bool close_conn;
};

const char* reason_of(int status) {
  switch (status) {
    case 200: return "OK";
    case 400: return "Bad Request";
    case 404: return "Not Found";
    case 413: return "Payload Too Large";
    case 500: return "Internal Server Error";
    default:  return "Status";
  }
}

std::string serialize(int status, const char* body, size_t len, bool close_conn) {
  std::string r;
  r.reserve(len + 128);
  r += "HTTP/1.1 ";
  r += std::to_string(status);
  r += ' ';
  r += reason_of(status);
  r += "\r\nContent-Type: application/json\r\nContent-Length: ";
  r += std::to_string(len);
  r += close_conn ? "\r\nConnection: close\r\n\r\n"
                  : "\r\nConnection: keep-alive\r\n\r\n";
  r.append(body, len);
  return r;
}

struct Server {
  int listen_fd = -1;
  int epoll_fd = -1;
  int wake_fd = -1;
  int port = 0;
  size_t max_body;
  std::atomic<bool> running{true};
  std::thread loop;

  std::mutex mu;  // guards req_queue, inflight, resp_queue
  std::condition_variable cv;
  std::deque<std::unique_ptr<Request>> req_queue;
  std::unordered_map<long long, std::unique_ptr<Request>> inflight;
  std::vector<Response> resp_queue;
  long long next_id = 1;
  uint64_t next_gen = 1;

  std::unordered_map<int, Conn> conns;  // event-loop thread only

  // ---- event-loop side -------------------------------------------------

  void set_events(int fd, bool want_write) {
    epoll_event ev{};
    ev.events = EPOLLIN | (want_write ? EPOLLOUT : 0u);
    ev.data.fd = fd;
    epoll_ctl(epoll_fd, EPOLL_CTL_MOD, fd, &ev);
  }

  void close_conn(int fd) {
    epoll_ctl(epoll_fd, EPOLL_CTL_DEL, fd, nullptr);
    ::close(fd);
    conns.erase(fd);
  }

  // Protocol-error reply: the connection is unrecoverable (we cannot
  // re-sync the request stream), so drop buffered input, block further
  // parsing (outstanding=true with no worker ever responding), and close
  // once the reply has flushed.
  void queue_direct_reply(int fd, Conn& c, int status, const std::string& body) {
    c.in.clear();
    c.outstanding = true;
    c.out += serialize(status, body.data(), body.size(), true);
    c.close_after_write = true;
    flush_out(fd, c);
  }

  // Returns false if the connection was closed.
  bool flush_out(int fd, Conn& c) {
    while (!c.out.empty()) {
      ssize_t n = ::send(fd, c.out.data(), c.out.size(), MSG_NOSIGNAL);
      if (n > 0) {
        c.out.erase(0, (size_t)n);
        continue;
      }
      if (n < 0 && (errno == EAGAIN || errno == EWOULDBLOCK)) {
        if (!c.want_write) {
          c.want_write = true;
          set_events(fd, true);
        }
        return true;
      }
      close_conn(fd);
      return false;
    }
    if (c.want_write) {
      c.want_write = false;
      set_events(fd, false);
    }
    if (c.close_after_write) {
      close_conn(fd);
      return false;
    }
    return true;
  }

  // Try to cut one complete request out of c.in.  Returns false if the
  // connection died.  Sets c.outstanding when a request was dispatched.
  bool try_parse(int fd, Conn& c) {
    while (!c.outstanding) {
      size_t hdr_end = c.in.find("\r\n\r\n");
      if (hdr_end == std::string::npos) {
        if (c.in.size() > 64 * 1024) {  // runaway header block
          queue_direct_reply(fd, c, 400, "{\"error\": \"header too large\"}");
          return conns.count(fd) != 0;
        }
        return true;
      }
      size_t line_end = c.in.find("\r\n");
      std::string line = c.in.substr(0, line_end);
      size_t sp1 = line.find(' ');
      size_t sp2 = line.find(' ', sp1 + 1);
      if (sp1 == std::string::npos || sp2 == std::string::npos) {
        queue_direct_reply(fd, c, 400, "{\"error\": \"bad request line\"}");
        return conns.count(fd) != 0;
      }
      std::string method = line.substr(0, sp1);
      std::string path = line.substr(sp1 + 1, sp2 - sp1 - 1);

      // Scan headers for Content-Length / Connection (case-insensitive).
      size_t content_length = 0;
      bool client_close = false;
      size_t pos = line_end + 2;
      while (pos < hdr_end) {
        size_t eol = c.in.find("\r\n", pos);
        if (eol == std::string::npos || eol > hdr_end) eol = hdr_end;
        size_t colon = c.in.find(':', pos);
        if (colon != std::string::npos && colon < eol) {
          std::string key = c.in.substr(pos, colon - pos);
          for (auto& ch : key) ch = (char)tolower((unsigned char)ch);
          size_t vs = colon + 1;
          while (vs < eol && c.in[vs] == ' ') ++vs;
          std::string val = c.in.substr(vs, eol - vs);
          if (key == "content-length") {
            content_length = (size_t)strtoull(val.c_str(), nullptr, 10);
          } else if (key == "connection") {
            for (auto& ch : val) ch = (char)tolower((unsigned char)ch);
            client_close = (val == "close");
          }
        }
        pos = eol + 2;
      }

      if (content_length > max_body) {
        // Reject without waiting for the body; client may die on the
        // write, that is its problem — we close after replying.
        queue_direct_reply(fd, c, 413, "{\"error\": \"body too large\"}");
        return conns.count(fd) != 0;
      }
      size_t body_start = hdr_end + 4;
      if (c.in.size() < body_start + content_length) return true;  // need more

      auto req = std::make_unique<Request>();
      req->fd = fd;
      req->gen = c.gen;
      req->client_close = client_close;
      req->method = std::move(method);
      req->path = std::move(path);
      req->body = c.in.substr(body_start, content_length);
      c.in.erase(0, body_start + content_length);
      c.outstanding = true;
      c.close_after_write = client_close;
      {
        std::lock_guard<std::mutex> lk(mu);
        req->id = next_id++;
        req_queue.push_back(std::move(req));
      }
      cv.notify_one();
    }
    return true;
  }

  void drain_responses() {
    std::vector<Response> batch;
    {
      std::lock_guard<std::mutex> lk(mu);
      batch.swap(resp_queue);
    }
    for (auto& r : batch) {
      auto it = conns.find(r.fd);
      if (it == conns.end() || it->second.gen != r.gen) continue;  // conn gone
      Conn& c = it->second;
      c.out += r.data;
      c.outstanding = false;
      c.close_after_write = c.close_after_write || r.close_conn;
      if (!flush_out(r.fd, c)) continue;
      // Keep-alive: the client may have pipelined the next request.
      if (!try_parse(r.fd, c)) continue;
    }
  }

  void run() {
    epoll_event evs[64];
    std::vector<char> buf(1 << 16);
    while (running.load(std::memory_order_relaxed)) {
      int n = epoll_wait(epoll_fd, evs, 64, 200);
      if (n < 0) {
        if (errno == EINTR) continue;
        break;
      }
      for (int i = 0; i < n; ++i) {
        int fd = evs[i].data.fd;
        uint32_t e = evs[i].events;
        if (fd == wake_fd) {
          uint64_t x;
          while (read(wake_fd, &x, 8) == 8) {
          }
          drain_responses();
          continue;
        }
        if (fd == listen_fd) {
          for (;;) {
            int cfd = accept4(listen_fd, nullptr, nullptr,
                              SOCK_NONBLOCK | SOCK_CLOEXEC);
            if (cfd < 0) break;
            int one = 1;
            setsockopt(cfd, IPPROTO_TCP, TCP_NODELAY, &one, sizeof(one));
            epoll_event ev{};
            ev.events = EPOLLIN;
            ev.data.fd = cfd;
            epoll_ctl(epoll_fd, EPOLL_CTL_ADD, cfd, &ev);
            Conn c;
            c.gen = next_gen++;
            conns.emplace(cfd, std::move(c));
          }
          continue;
        }
        auto it = conns.find(fd);
        if (it == conns.end()) continue;
        Conn& c = it->second;
        if (e & (EPOLLHUP | EPOLLERR)) {
          close_conn(fd);
          continue;
        }
        if (e & EPOLLOUT) {
          if (!flush_out(fd, c)) continue;
          if (!try_parse(fd, c)) continue;
        }
        if (e & EPOLLIN) {
          bool closed = false;
          for (;;) {
            ssize_t r = ::recv(fd, buf.data(), buf.size(), 0);
            if (r > 0) {
              c.in.append(buf.data(), (size_t)r);
              // Bound buffered pipelined data: one request (max_body) plus
              // header slack.  Beyond that the client is misbehaving.
              if (c.in.size() > max_body + 128 * 1024) {
                close_conn(fd);
                closed = true;
                break;
              }
              if ((size_t)r < buf.size()) break;
              continue;
            }
            if (r < 0 && (errno == EAGAIN || errno == EWOULDBLOCK)) break;
            // r == 0 (peer closed) or hard error
            if (!c.outstanding) {
              close_conn(fd);
            } else {
              // Reply still coming from a worker; mark dead via gen bump so
              // the respond path drops it, and close now.
              close_conn(fd);
            }
            closed = true;
            break;
          }
          if (closed) continue;
          if (!try_parse(fd, c)) continue;
        }
      }
    }
    // Shutdown: close everything, wake workers.
    for (auto& kv : conns) ::close(kv.first);
    conns.clear();
    cv.notify_all();
  }
};

}  // namespace

extern "C" {

void* ih_start(const char* host, int port, long long max_body) {
  auto s = std::make_unique<Server>();
  s->max_body = (size_t)max_body;
  s->listen_fd = ::socket(AF_INET, SOCK_STREAM | SOCK_NONBLOCK | SOCK_CLOEXEC, 0);
  if (s->listen_fd < 0) return nullptr;
  int one = 1;
  setsockopt(s->listen_fd, SOL_SOCKET, SO_REUSEADDR, &one, sizeof(one));
  sockaddr_in addr{};
  addr.sin_family = AF_INET;
  addr.sin_port = htons((uint16_t)port);
  if (inet_pton(AF_INET, host, &addr.sin_addr) != 1) {
    ::close(s->listen_fd);
    return nullptr;
  }
  if (bind(s->listen_fd, (sockaddr*)&addr, sizeof(addr)) < 0 ||
      listen(s->listen_fd, 512) < 0) {
    ::close(s->listen_fd);
    return nullptr;
  }
  socklen_t alen = sizeof(addr);
  getsockname(s->listen_fd, (sockaddr*)&addr, &alen);
  s->port = ntohs(addr.sin_port);

  s->epoll_fd = epoll_create1(EPOLL_CLOEXEC);
  s->wake_fd = eventfd(0, EFD_NONBLOCK | EFD_CLOEXEC);
  if (s->epoll_fd < 0 || s->wake_fd < 0) {
    ::close(s->listen_fd);
    if (s->epoll_fd >= 0) ::close(s->epoll_fd);
    if (s->wake_fd >= 0) ::close(s->wake_fd);
    return nullptr;
  }
  epoll_event ev{};
  ev.events = EPOLLIN;
  ev.data.fd = s->listen_fd;
  epoll_ctl(s->epoll_fd, EPOLL_CTL_ADD, s->listen_fd, &ev);
  ev.data.fd = s->wake_fd;
  epoll_ctl(s->epoll_fd, EPOLL_CTL_ADD, s->wake_fd, &ev);

  Server* raw = s.release();
  raw->loop = std::thread([raw] { raw->run(); });
  return raw;
}

int ih_port(void* h) { return ((Server*)h)->port; }

long long ih_next(void* h, int timeout_ms, char* meta, int meta_cap,
                  const char** body, long long* body_len) {
  Server* s = (Server*)h;
  std::unique_lock<std::mutex> lk(s->mu);
  if (!s->cv.wait_for(lk, std::chrono::milliseconds(timeout_ms), [s] {
        return !s->req_queue.empty() ||
               !s->running.load(std::memory_order_relaxed);
      })) {
    return 0;  // timeout
  }
  if (s->req_queue.empty()) return -1;  // stopped
  std::unique_ptr<Request> req = std::move(s->req_queue.front());
  s->req_queue.pop_front();
  Request* r = req.get();
  s->inflight.emplace(r->id, std::move(req));
  // Third token tells Python to echo "Connection: close" in the reply
  // (the conn is torn down after the write either way).
  std::string m = r->method + " " + r->path + (r->client_close ? " close" : "");
  snprintf(meta, (size_t)meta_cap, "%s", m.c_str());
  *body = r->body.data();
  *body_len = (long long)r->body.size();
  return r->id;
}

int ih_respond(void* h, long long id, int status, const char* body,
               long long len, int close_conn) {
  Server* s = (Server*)h;
  Response resp;
  resp.id = id;
  resp.data = serialize(status, body, (size_t)len, close_conn != 0);
  resp.close_conn = close_conn != 0;
  {
    std::lock_guard<std::mutex> lk(s->mu);
    auto it = s->inflight.find(id);
    if (it == s->inflight.end()) return 0;
    resp.fd = it->second->fd;
    resp.gen = it->second->gen;
    s->inflight.erase(it);
    s->resp_queue.push_back(std::move(resp));
  }
  uint64_t one = 1;
  ssize_t ignored = write(s->wake_fd, &one, 8);
  (void)ignored;
  return 1;
}

void ih_stop(void* h) {
  Server* s = (Server*)h;
  s->running.store(false);
  {
    uint64_t one = 1;
    ssize_t ignored = write(s->wake_fd, &one, 8);
    (void)ignored;
  }
  s->cv.notify_all();
  if (s->loop.joinable()) s->loop.join();
  ::close(s->listen_fd);
  ::close(s->epoll_fd);
  ::close(s->wake_fd);
  delete s;
}

}  // extern "C"
