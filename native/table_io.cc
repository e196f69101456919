// Native IO for the artifact store: atomic durable writes and zero-copy
// mmap reads of column files.
//
// The role of Scanner's C++ table-store IO in the reference (materialized
// typed columns between every stage — SURVEY §2.2): the Python store keeps
// the manifest/schema logic, and delegates bulk byte movement here. mmap
// reads let multi-GB columns (bitmaps, descriptors, depth maps) be consumed
// by numpy without a copy; writes are tmp+fsync+rename so a crashed stage
// never leaves a torn file.

#include <cerrno>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <fcntl.h>
#include <string>
#include <sys/mman.h>
#include <sys/stat.h>
#include <unistd.h>

extern "C" {

// Atomic durable write: path.tmp-<pid> -> fsync -> rename. Returns 0 on
// success, negative errno on failure.
int64_t tio_write_atomic(const char* path, const void* data, int64_t nbytes) {
  std::string tmp = std::string(path) + ".tmp-" + std::to_string(getpid());
  int fd = ::open(tmp.c_str(), O_WRONLY | O_CREAT | O_TRUNC, 0644);
  if (fd < 0) return -errno;
  const char* p = static_cast<const char*>(data);
  int64_t left = nbytes;
  while (left > 0) {
    ssize_t w = ::write(fd, p, static_cast<size_t>(left));
    if (w < 0) {
      if (errno == EINTR) continue;
      int e = errno;
      ::close(fd);
      ::unlink(tmp.c_str());
      return -e;
    }
    p += w;
    left -= w;
  }
  if (::fsync(fd) != 0) {
    int e = errno;
    ::close(fd);
    ::unlink(tmp.c_str());
    return -e;
  }
  ::close(fd);
  if (::rename(tmp.c_str(), path) != 0) {
    int e = errno;
    ::unlink(tmp.c_str());
    return -e;
  }
  return 0;
}

// mmap a file read-only. On success returns 0 and fills *out_ptr/*out_size.
int64_t tio_mmap_open(const char* path, void** out_ptr, int64_t* out_size) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return -errno;
  struct stat st;
  if (::fstat(fd, &st) != 0) {
    int e = errno;
    ::close(fd);
    return -e;
  }
  if (st.st_size == 0) {
    ::close(fd);
    *out_ptr = nullptr;
    *out_size = 0;
    return 0;
  }
  void* p = ::mmap(nullptr, static_cast<size_t>(st.st_size), PROT_READ,
                   MAP_PRIVATE, fd, 0);
  ::close(fd);
  if (p == MAP_FAILED) return -errno;
  ::madvise(p, static_cast<size_t>(st.st_size), MADV_SEQUENTIAL);
  *out_ptr = p;
  *out_size = st.st_size;
  return 0;
}

int64_t tio_mmap_close(void* ptr, int64_t size) {
  if (ptr == nullptr || size == 0) return 0;
  return ::munmap(ptr, static_cast<size_t>(size)) == 0 ? 0 : -errno;
}

// Bulk read into a caller buffer (for when a copy is wanted anyway).
int64_t tio_read(const char* path, void* out, int64_t cap) {
  int fd = ::open(path, O_RDONLY);
  if (fd < 0) return -errno;
  char* p = static_cast<char*>(out);
  int64_t total = 0;
  while (total < cap) {
    ssize_t r = ::read(fd, p + total, static_cast<size_t>(cap - total));
    if (r < 0) {
      if (errno == EINTR) continue;
      int e = errno;
      ::close(fd);
      return -e;
    }
    if (r == 0) break;
    total += r;
  }
  ::close(fd);
  return total;
}

}  // extern "C"
