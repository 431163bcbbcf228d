// Asynchronous binary field I/O (TPU-native counterpart of the reference's
// MPI-IO Field3d_io, src/field3d_io.cxx).
//
// The reference writes restart fields with collective MPI-IO; here each host
// writes its fields through a background writer thread so restart/dump I/O
// overlaps device compute (the reference overlaps stats I/O with GPU compute
// via OpenMP tasks, src/model.cxx:317-334 — this is the equivalent for the
// host side of the TPU runtime).
//
// C API (used from Python via ctypes):
//   fastio_init(nworkers)            — start the writer pool
//   fastio_write(path, data, nbytes) — enqueue an owned copy for writing
//   fastio_flush()                   — block until the queue drains
//   fastio_shutdown()                — flush + join
//   fastio_errors()                  — number of failed writes since init
//
// Build: g++ -O3 -shared -fPIC -o libfastio.so fastio.cpp -lpthread

#include <atomic>
#include <condition_variable>
#include <cstdio>
#include <cstring>
#include <deque>
#include <mutex>
#include <string>
#include <thread>
#include <vector>

namespace {

struct Job {
    std::string path;
    std::vector<char> data;
};

std::deque<Job> queue;
std::mutex mtx;
std::condition_variable cv_push;   // signals workers
std::condition_variable cv_done;   // signals flush()
std::vector<std::thread> workers;
std::atomic<bool> running{false};
std::atomic<int> in_flight{0};
std::atomic<long> error_count{0};

void worker_main()
{
    for (;;)
    {
        Job job;
        {
            std::unique_lock<std::mutex> lock(mtx);
            cv_push.wait(lock, [] { return !queue.empty() || !running.load(); });
            if (queue.empty())
            {
                if (!running.load())
                    return;
                continue;
            }
            job = std::move(queue.front());
            queue.pop_front();
        }

        std::FILE* f = std::fopen(job.path.c_str(), "wb");
        if (f == nullptr)
        {
            error_count.fetch_add(1);
        }
        else
        {
            const size_t n = std::fwrite(job.data.data(), 1, job.data.size(), f);
            if (n != job.data.size())
                error_count.fetch_add(1);
            std::fclose(f);
        }

        if (in_flight.fetch_sub(1) == 1)
            cv_done.notify_all();
    }
}

} // namespace

extern "C" {

int fastio_init(int nworkers)
{
    if (running.load())
        return 0;
    if (nworkers < 1)
        nworkers = 1;
    running.store(true);
    error_count.store(0);
    for (int i = 0; i < nworkers; ++i)
        workers.emplace_back(worker_main);
    return 0;
}

int fastio_write(const char* path, const void* data, long nbytes)
{
    if (!running.load() || nbytes < 0)
        return -1;
    Job job;
    job.path = path;
    job.data.resize(static_cast<size_t>(nbytes));
    std::memcpy(job.data.data(), data, static_cast<size_t>(nbytes));
    {
        std::lock_guard<std::mutex> lock(mtx);
        in_flight.fetch_add(1);
        queue.push_back(std::move(job));
    }
    cv_push.notify_one();
    return 0;
}

int fastio_flush(void)
{
    std::unique_lock<std::mutex> lock(mtx);
    cv_done.wait(lock, [] { return in_flight.load() == 0; });
    return 0;
}

int fastio_shutdown(void)
{
    if (!running.load())
        return 0;
    fastio_flush();
    running.store(false);
    cv_push.notify_all();
    for (auto& t : workers)
        t.join();
    workers.clear();
    return 0;
}

long fastio_errors(void)
{
    return error_count.load();
}

} // extern "C"
